from typing import Callable, Dict
QUERIES: Dict[str, Callable] = {}
ORACLES: Dict[str, str] = {}
