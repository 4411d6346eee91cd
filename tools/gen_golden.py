#!/usr/bin/env python3
"""Independent (non-Spark) computation of the expected CoT output for the
drones.json fixture — mirrors the reference transform semantics exactly
(task.ts:123-214) in plain Python, writes src/test/resources/cot_golden.json.

Dev-only tool. Numbers (azimuth/range) may differ from the JVM in the last
ulp; the golden test compares with 1e-6 relative tolerance.
"""
import json, math, sys

def bearing(lat1, lon1, lat2, lon2):
    la1, la2 = math.radians(lat1), math.radians(lat2)
    dlon = math.radians(lon2 - lon1)
    x = math.sin(dlon) * math.cos(la2)
    y = math.cos(la1) * math.sin(la2) - math.sin(la1) * math.cos(la2) * math.cos(dlon)
    return (math.degrees(math.atan2(x, y)) + 360) % 360

def distance(lat1, lon1, lat2, lon2):
    R = 6371000
    la1, la2 = math.radians(lat1), math.radians(lat2)
    dla, dlo = math.radians(lat2 - lat1), math.radians(lon2 - lon1)
    a = math.sin(dla/2)**2 + math.cos(la1)*math.cos(la2)*math.sin(dlo/2)**2
    return R * 2 * math.atan2(math.sqrt(a), math.sqrt(1 - a))

def main():
    drones = json.load(open("src/main/resources/graft/drones.json"))
    feats = []
    for r in drones:
        feat = {
            "id": r["id"],
            "type": "Feature",
            "properties": {
                "type": "a-f-A-M-H-Q",
                "callsign": r["callSign"],
                "speed": r["speed"],
                "course": r["heading"],
                "links": [],
                "metadata": dict(r),
            },
            "geometry": {
                "type": "Point",
                "coordinates": [r["longitude"], r["latitude"], r["altitudeAgl"]],
            },
        }
        for sensor in r["sensors"]:
            if not sensor.get("rtsp_url"):
                continue
            feat["properties"]["video"] = {
                "uid": r["id"],
                "sensor": r["callSign"] + "-camera",
                "url": sensor["rtsp_url"],
                "connection": {
                    "uid": r["id"], "networkTimeout": 12000, "path": "",
                    "protocol": "raw", "bufferTime": -1,
                    "address": sensor["rtsp_url"], "port": -1, "roverPort": -1,
                    "rtspReliable": 0, "ignoreEmbeddedKLV": False,
                    "alias": r["callSign"],
                },
            }
            feat["properties"]["links"].append({
                "uid": r["id"], "relation": "r-u", "type": "text/html",
                "url": sensor.get("video_url"),  # deliberately un-null-checked
                "remarks": "DroneSense Viewer",
            })
            break
        if r["spoiLat"] != 0 and r["spoiLng"] != 0:
            feat["properties"]["sensor"] = {
                "azimuth": bearing(r["latitude"], r["longitude"], r["spoiLat"], r["spoiLng"]),
                "fov": 45, "vfov": 45,
                "range": distance(r["latitude"], r["longitude"], r["spoiLat"], r["spoiLng"]),
                "elevation": 0, "roll": 0, "displayMagneticReference": 0,
                "strokeColor": -16777216, "strokeWeight": 0.5,
                "fovRed": 1.0, "fovGreen": 0.5, "fovBlue": 0.0, "fovAlpha": 0.3,
                "rangeLines": 100, "rangeLineStrokeColor": -16777216,
                "rangeLineStrokeWeight": 1.0,
            }
        feats.append(feat)
    fc = {"type": "FeatureCollection", "features": feats}
    out = "src/test/resources/cot_golden.json"
    json.dump(fc, open(out, "w"), indent=2, sort_keys=True)
    print(f"wrote {out} ({len(feats)} features)")

if __name__ == "__main__":
    main()
