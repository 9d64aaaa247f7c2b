"""m07 broadcast-regime stress — the reproducible source for PERF.md's
m07 de-hint row (r12; the multimodal edition of the r30 labels proof).

duplicate_video_pairs' per-video frame-count relation (``per_video``)
has one row per video with >= 1 sampled frame — it IS the corpus at
100 TB of media, the r11 verdict's scale flag. With the static
F.broadcast hints removed, the join strategy must come from runtime
stats: broadcast while per_video actually fits the threshold, shuffled
join once it doesn't. This harness scores the m07 pair join at N
videos (default 10x and 100x the graded 48-video corpus) under

  * the default threshold (AQE broadcasts the genuinely-small side —
    the zero-cost-at-demo-scale half of the argument), and
  * autoBroadcastJoinThreshold = -1 (broadcast disabled entirely — the
    forced-shuffled-join regime standing in for per_video outgrowing
    the 8 GB / 512M-row caps),

and requires BOTH to complete with identical pair counts and a
hint-free analyzed plan. The synthetic series corpus is dup-dense by
design (every video shares frames with its whole series), so the pair
join itself is the worst-case shape.

Usage: python tools/stress_m07.py [n_videos ...]   (default: 480 4800)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_once(spark, n_videos: int, tag: str) -> tuple:
    from ankaflow_spark.operators.multimodal import (
        duplicate_video_pairs,
        frame_hashes,
        synth_video_series,
    )

    df = duplicate_video_pairs(frame_hashes(synth_video_series(spark, n_videos)))
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed, "static hint crept back in"
    t0 = time.time()
    n_pairs = df.count()
    wall = time.time() - t0
    executed = df._jdf.queryExecution().executedPlan().toString()
    join = (
        "BroadcastHashJoin"
        if "BroadcastHashJoin" in executed
        else "SortMergeJoin"
        if "SortMergeJoin" in executed
        else "ShuffledHashJoin"
    )
    print(
        f"m07-pairs[{tag}]  videos={n_videos}  pairs={n_pairs}  "
        f"{wall:.1f}s  per_video-join={join}"
    )
    return n_pairs, join


def main() -> None:
    from ankaflow_spark.session import get_spark

    sizes = [int(a) for a in sys.argv[1:]] or [480, 4800]
    spark = get_spark("m07-stress")
    for n_videos in sizes:
        base_pairs, base_join = run_once(spark, n_videos, "default-threshold")
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
        old_aqe = spark.conf.get(
            "spark.sql.adaptive.autoBroadcastJoinThreshold", old
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        try:
            smj_pairs, smj_join = run_once(spark, n_videos, "broadcast-off")
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
            spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", old_aqe)
        assert smj_pairs == base_pairs, (smj_pairs, base_pairs)
        assert smj_join != "BroadcastHashJoin", "broadcast off yet still broadcast?"


if __name__ == "__main__":
    main()
