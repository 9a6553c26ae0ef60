#!/usr/bin/env python
"""Generate ``unet_tpu/geo/_epsg_data.py`` from the PROJ database.

The GeoTIFF writer must classify a bare ``EPSG:xxxx`` CRS as geographic
(GeographicTypeGeoKey, GTModelType=2) or projected (ProjectedCSTypeGeoKey,
GTModelType=1) and emit the CRS's actual angular/linear unit. Block
heuristics get this wrong: the 4000-4999 "geographic" block contains
projected intruders (EPSG:4647 ETRS89/UTM32N zE-N, 4087/4088 World
Equidistant Cylindrical, 4839 ETRS89/LCC Germany, the NAD27/BLM ftUS
zones, ...), and modern geographic datum realizations live outside it
(EPSG:7844 GDA2020, 9755 WGS84 G2139, ...).

This tool queries the authoritative EPSG dataset shipped with PROJ
(``/usr/share/proj/proj.db``, an SQLite file) and bakes the classification
into a committed, dependency-free Python module:

* range-compressed sets of all geographic (2D+3D) and projected EPSG codes
  (deprecated codes included — they still appear in archived products);
* unit exceptions: geographic CRS whose axis unit is not degree
  (e.g. EPSG:4807 NTF Paris, grads) and projected CRS whose axis unit is
  not metre (e.g. the EPSG:4399+ NAD27/BLM zones, US survey feet).

Run offline whenever PROJ updates::

    python tools/gen_epsg_data.py [--db /usr/share/proj/proj.db]

Reference equivalent: GDAL links PROJ and resolves this via the same
database at runtime (reference predict.py:29-52 SetProjection). We bake it
at build time instead — the TPU image keeps raster I/O dependency-free.
"""

from __future__ import annotations

import argparse
import sqlite3
from pathlib import Path

# EPSG unit-of-measure codes in the degree family (GeoTIFF angular units).
# 9101 radian, 9102 degree, 9104 arc-second, 9105 grad, 9122 degree
# (supplier to define representation) — GeoTIFF uses 9102 for all degree
# flavours, so 9122 normalizes to 9102.
DEGREE_FAMILY = {9102, 9122, 9110, 9115, 9116, 9117, 9118, 9119, 9120, 9121}
METRE = 9001


def ranges(codes):
    """Compress a sorted iterable of ints into (start, end) inclusive pairs."""
    out = []
    for c in sorted(codes):
        if out and c == out[-1][1] + 1:
            out[-1][1] = c
        else:
            out.append([c, c])
    return [tuple(r) for r in out]


def fetch(db, sql):
    return [tuple(r) for r in db.execute(sql)]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--db", default="/usr/share/proj/proj.db")
    ap.add_argument(
        "--out",
        default=str(Path(__file__).resolve().parent.parent / "unet_tpu" / "geo" / "_epsg_data.py"),
    )
    args = ap.parse_args()
    db = sqlite3.connect(args.db)

    proj_version = db.execute(
        "SELECT value FROM metadata WHERE key='EPSG.VERSION'"
    ).fetchone()
    proj_version = (proj_version[0] if proj_version else "unknown").lstrip("v")

    geog = fetch(
        db,
        "SELECT CAST(code AS INT) FROM geodetic_crs "
        "WHERE auth_name='EPSG' AND type LIKE 'geographic%'",
    )
    proj = fetch(db, "SELECT CAST(code AS INT) FROM projected_crs WHERE auth_name='EPSG'")
    geog_codes = sorted(c for (c,) in geog)
    proj_codes = sorted(c for (c,) in proj)
    overlap = set(geog_codes) & set(proj_codes)
    if overlap:
        raise SystemExit(f"geographic/projected code overlap: {sorted(overlap)[:10]}")

    # First-axis unit per CRS (axes of one coordinate system share units for
    # every horizontal CRS in the EPSG dataset).
    geog_units = dict(
        fetch(
            db,
            "SELECT CAST(g.code AS INT), CAST(a.uom_code AS INT) FROM geodetic_crs g "
            "JOIN axis a ON a.coordinate_system_auth_name=g.coordinate_system_auth_name "
            "AND a.coordinate_system_code=g.coordinate_system_code "
            "AND a.coordinate_system_order=1 "
            "WHERE g.auth_name='EPSG' AND g.type LIKE 'geographic%' AND a.uom_auth_name='EPSG'",
        )
    )
    proj_units = dict(
        fetch(
            db,
            "SELECT CAST(p.code AS INT), CAST(a.uom_code AS INT) FROM projected_crs p "
            "JOIN axis a ON a.coordinate_system_auth_name=p.coordinate_system_auth_name "
            "AND a.coordinate_system_code=p.coordinate_system_code "
            "AND a.coordinate_system_order=1 "
            "WHERE p.auth_name='EPSG' AND a.uom_auth_name='EPSG'",
        )
    )
    geog_exc = {c: u for c, u in sorted(geog_units.items()) if u not in DEGREE_FAMILY}
    proj_exc = {c: u for c, u in sorted(proj_units.items()) if u != METRE}

    gr = ranges(geog_codes)
    pr = ranges(proj_codes)

    def fmt_ranges(rs):
        lines, row = [], []
        for pair in rs:
            row.append(f"({pair[0]}, {pair[1]})")
            if len(row) == 6:
                lines.append("    " + ", ".join(row) + ",")
                row = []
        if row:
            lines.append("    " + ", ".join(row) + ",")
        return "\n".join(lines)

    def fmt_dict(d):
        lines, row = [], []
        for k, v in d.items():
            row.append(f"{k}: {v}")
            if len(row) == 8:
                lines.append("    " + ", ".join(row) + ",")
                row = []
        if row:
            lines.append("    " + ", ".join(row) + ",")
        return "\n".join(lines)

    out = f'''"""EPSG geographic/projected classification + unit exceptions.

GENERATED by tools/gen_epsg_data.py from the PROJ-shipped EPSG dataset
(EPSG v{proj_version}) — do not edit by hand. {len(geog_codes)} geographic and
{len(proj_codes)} projected CRS codes, range-compressed; unit maps list only
the exceptions (geographic CRS not in degrees / projected CRS not in
metres). Used by geo/tiff.py to synthesize spec-conformant GeoKey sets from
bare "EPSG:xxxx" labels (GeoTIFF requirement; the reference gets the same
answer from GDAL+PROJ at runtime, predict.py:29-52).
"""

from bisect import bisect_right

EPSG_DATASET_VERSION = "{proj_version}"

# (start, end) inclusive code ranges, sorted.
_GEOGRAPHIC_RANGES = (
{fmt_ranges(gr)}
)

_PROJECTED_RANGES = (
{fmt_ranges(pr)}
)

# Geographic CRS whose axis unit is not a degree flavour (EPSG uom code,
# e.g. 9105 = grad for the NTF-Paris family).
GEOGRAPHIC_UNIT_EXCEPTIONS = {{
{fmt_dict(geog_exc)}
}}

# Projected CRS whose axis unit is not metre (9002 ft, 9003 ftUS, ...).
PROJECTED_UNIT_EXCEPTIONS = {{
{fmt_dict(proj_exc)}
}}

_GEOG_STARTS = tuple(r[0] for r in _GEOGRAPHIC_RANGES)
_PROJ_STARTS = tuple(r[0] for r in _PROJECTED_RANGES)


def _in_ranges(code, starts, ranges):
    i = bisect_right(starts, code) - 1
    return i >= 0 and code <= ranges[i][1]


def epsg_kind(code):
    """'geographic' | 'projected' | None (unknown/non-horizontal code)."""
    if _in_ranges(code, _GEOG_STARTS, _GEOGRAPHIC_RANGES):
        return "geographic"
    if _in_ranges(code, _PROJ_STARTS, _PROJECTED_RANGES):
        return "projected"
    return None


def geographic_angular_unit(code):
    """EPSG angular-unit code for a geographic CRS (9102 degree default)."""
    return GEOGRAPHIC_UNIT_EXCEPTIONS.get(code, 9102)


def projected_linear_unit(code):
    """EPSG linear-unit code for a projected CRS (9001 metre default)."""
    return PROJECTED_UNIT_EXCEPTIONS.get(code, 9001)
'''
    Path(args.out).write_text(out)
    print(
        f"wrote {args.out}: {len(gr)} geographic ranges ({len(geog_codes)} codes), "
        f"{len(pr)} projected ranges ({len(proj_codes)} codes), "
        f"{len(geog_exc)}/{len(proj_exc)} unit exceptions (EPSG v{proj_version})"
    )


if __name__ == "__main__":
    main()
