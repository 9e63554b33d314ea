"""Map manager: resolves a scenario type to parsed `MapData`, with an
on-disk compiled cache so runtime never needs the raw map files.

Parity with reference `sigmarl/map_manager.py:13-40` (parser dispatch) —
"cpm*" scenarios use the CPM XML parser, everything else the OSM parser.
Raw map files are looked up in (first hit wins):

1. `$SIGMARL_TPU_MAP_DIR`
2. `sigmarl_tpu/maps/assets/` (shipped — see its README for provenance)

Compiled caches live in `sigmarl_tpu/maps/cache/<scenario>.pkl` and are
committed; with both sources and caches in the package, a fresh clone is
fully self-contained.
"""

from __future__ import annotations

import os
import pickle

from sigmarl_tpu.constants import SCENARIOS
from sigmarl_tpu.maps.data import MapData

_HERE = os.path.dirname(os.path.abspath(__file__))
_CACHE_DIR = os.path.join(_HERE, "cache")
_CACHE_VERSION = 1

_SEARCH_DIRS = [
    os.environ.get("SIGMARL_TPU_MAP_DIR", ""),
    os.path.join(_HERE, "assets"),
]


def _find_map_file(map_path: str) -> str:
    for d in _SEARCH_DIRS:
        if not d:
            continue
        candidate = os.path.join(d, map_path)
        if os.path.exists(candidate):
            return candidate
    raise FileNotFoundError(
        f"Map file {map_path!r} not found in {_SEARCH_DIRS}; "
        "set SIGMARL_TPU_MAP_DIR or use the compiled cache."
    )


def parse_map(scenario_type: str, lane_width: float = None) -> MapData:
    """Parse a scenario's map from its raw file (no cache)."""
    map_path = SCENARIOS[scenario_type]["map_path"]
    map_file = _find_map_file(map_path)
    if "cpm" in scenario_type:
        from sigmarl_tpu.maps.parse_xml import parse_cpm_xml

        return parse_cpm_xml(scenario_type, map_file)
    from sigmarl_tpu.maps.parse_osm import parse_osm

    return parse_osm(scenario_type, map_file, lane_width=lane_width)


def load_map(scenario_type: str, lane_width: float = None, use_cache: bool = True) -> MapData:
    """Load a scenario's map, preferring the compiled cache.

    A non-default `lane_width` (custom OSM scenarios) bypasses the cache.
    """
    cache_file = os.path.join(_CACHE_DIR, f"{scenario_type}.pkl")
    default_width = lane_width is None or lane_width == SCENARIOS[scenario_type].get("lane_width")
    if use_cache and default_width and os.path.exists(cache_file):
        with open(cache_file, "rb") as f:
            version, data = pickle.load(f)
        if version == _CACHE_VERSION:
            return data
    data = parse_map(scenario_type, lane_width=lane_width)
    if use_cache and default_width:
        os.makedirs(_CACHE_DIR, exist_ok=True)
        with open(cache_file, "wb") as f:
            pickle.dump((_CACHE_VERSION, data), f)
    return data


class MapManager:
    """Thin OO facade over `load_map` for API parity with the reference."""

    def __init__(self, scenario_type: str = "cpm_entire", device=None, lane_width: float = None):
        self._scenario_type = scenario_type
        self.map_data = load_map(scenario_type, lane_width=lane_width)

    @property
    def parser(self) -> MapData:
        return self.map_data
