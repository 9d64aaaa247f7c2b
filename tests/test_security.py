"""Template-sandbox security battery (reference test_security.py /
test_safe_containers.py behaviors, re-expressed for the jinja2
SandboxedEnvironment that provides them here). The sandbox's contract:
unsafe attribute access yields UNDEFINED (renders empty), traversal
through an unsafe attribute raises SecurityError, and unknown names
raise on attribute access — in no case does an internal object, an
environment variable, or a dunder leak into rendered output.
"""

import pytest

from ankaflow_spark.plans.renderer import Renderer


@pytest.fixture()
def renderer():
    return Renderer()


def _render(renderer, template, **ctx):
    return renderer.render(template, ctx)


def test_dunder_renders_empty_never_leaks(renderer):
    assert _render(renderer, "<< ''.__class__ >>") == ""
    assert _render(renderer, "<< (1).__class__ >>") == ""


def test_mro_subclasses_exploit_raises(renderer):
    # the classic escape chain str -> type -> object -> subclasses is
    # cut at the first hop with an explicit SecurityError
    from jinja2.exceptions import SecurityError

    with pytest.raises(SecurityError):
        _render(renderer, "<< ''.__class__.__mro__[1].__subclasses__() >>")


def test_os_environ_unreachable(renderer):
    from jinja2.exceptions import UndefinedError

    with pytest.raises(UndefinedError):
        _render(renderer, "<< os.environ >>")


def test_attr_filter_gated_like_dot_access(renderer):
    assert _render(renderer, "<< ''|attr('__class__') >>") == ""


def test_context_objects_internals_hidden(renderer):
    class Holder:
        secret = "s3cr3t"

    # plain variables render; __dict__ of a leaked object does not
    assert _render(renderer, "<< x >>", x="v") == "v"
    out = _render(renderer, "<< h.__dict__ >>", h=Holder())
    assert "s3cr3t" not in str(out) and str(out) == ""


def test_no_env_in_error_surface(renderer):
    import os

    os.environ["ANKAFLOW_TEST_CANARY"] = "canary-value"
    try:
        try:
            _render(renderer, "<< missing.attr >>")
        except Exception as e:
            assert "canary-value" not in str(e)
    finally:
        os.environ.pop("ANKAFLOW_TEST_CANARY", None)
