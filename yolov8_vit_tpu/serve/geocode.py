"""AMap geocoding (parity: `/root/reference/utils/utils.py:248-275`)."""
from __future__ import annotations

import os

import requests


def location2lalo(location: str):
    """Address string -> (formatted_address, "lng,lat") or (None, None).

    Requires AMAP_API_KEY in the environment (the reference hardcodes a
    sample key; we do not)."""
    api_key = os.environ.get("AMAP_API_KEY")
    if not api_key:
        print("location2lalo: AMAP_API_KEY not set")
        return None, None
    try:
        response = requests.get(
            "https://restapi.amap.com/v3/geocode/geo",
            params={"address": location, "key": api_key}, timeout=5)
        response.raise_for_status()
        answer = response.json()
        if answer.get("status") == "1" and answer.get("geocodes"):
            return (answer["geocodes"][0]["formatted_address"],
                    answer["geocodes"][0]["location"])
        print(f"AMap error: {answer.get('info', 'unknown')}")
        return None, None
    except (requests.exceptions.RequestException, KeyError, IndexError,
            ValueError) as e:
        print(f"location2lalo error: {e}")
        return None, None
