"""Leaderboard route-file parsing (assets/routes_lav_*.xml format).

Parses the evaluation route XML the reference ships
(/root/reference/assets/routes_lav_valid.xml: <route id town> with
<waypoint x y z yaw .../>) into world-frame waypoint arrays and, for the
replay/sim evaluators, into the (gnss, command) global-plan format the
Waypointer consumes (CARLA's equirectangular GPS convention with the map
origin at lat=lon=0).
"""

from __future__ import annotations

import math
import re
import xml.etree.ElementTree as ET
from typing import Dict, List, Tuple

import numpy as np

EARTH_RADIUS = 6371e3
LANEFOLLOW = 4  # RoadOption value


def parse_routes(path: str) -> List[Dict]:
    """-> [{'id': str, 'town': str, 'waypoints': (N, 3) xyz, 'yaws': (N,)}]"""
    # the shipped files contain literal "\n" escapes between waypoint tags;
    # normalize before XML parsing
    with open(path) as f:
        text = f.read().replace("\\n", " ")
    root = ET.fromstring(text)
    routes = []
    for r in root.iter("route"):
        wps, yaws = [], []
        for w in r.iter("waypoint"):
            wps.append([float(w.get("x")), float(w.get("y")),
                        float(w.get("z", 0.0))])
            yaws.append(math.radians(float(w.get("yaw", 0.0))))
        routes.append(dict(
            id=r.get("id"), town=r.get("town"),
            waypoints=np.asarray(wps), yaws=np.asarray(yaws),
        ))
    return routes


def world_to_gps(x: float, y: float) -> Tuple[float, float]:
    """CARLA world xy -> lat/lon with the default map geo-reference
    (origin at 0N 0E; the inverse of the agents' latlon_to_xy with cos0=0)."""
    lat = x / EARTH_RADIUS / (math.pi / 180.0)
    lon = y / EARTH_RADIUS / (math.pi / 180.0)
    return lat, lon


def route_to_global_plan(route: Dict, cmd: int = LANEFOLLOW):
    """Route dict -> [(gnss dict, RoadOption value)] for Waypointer /
    RoutePlanner.  Sparse route files carry no per-waypoint commands; the
    live leaderboard interpolates them — here every waypoint defaults to
    LANEFOLLOW, which is what the dense RoutePlanner needs."""
    plan = []
    for x, y, _ in route["waypoints"]:
        lat, lon = world_to_gps(x, y)
        plan.append(({"lat": lat, "lon": lon}, cmd))
    return plan
