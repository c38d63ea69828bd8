#!/usr/bin/env python3
"""Generate src/test/resources/refstore — a spatialdata container fixture in
the REFERENCE's on-disk layout (not the engine's), written by plain python so
the Scala reader is proven against an external writer:

  shapes/circles_v01   ShapesFormatV01 ragged arrays, POINT + radius
  shapes/polys_v01     ShapesFormatV01 ragged arrays, POLYGON (one has a hole)
  shapes/mpolys_v01    ShapesFormatV01 ragged arrays, MULTIPOLYGON, int32 offsets
  shapes/gp_v02        ShapesFormatV02: single-file GeoParquet (WKB)
  tables/t_dense       AnnData zarr: dense X, obs with categorical + strings
  tables/t_csr         AnnData zarr: CSR X (int32 indices, int64 indptr)
  points/pts_v01       points.parquet + reference-style .zattrs

Layouts follow reference/src/spatialdata/_io/io_shapes.py:33-67 (V01 ragged /
V02 parquet), io_table.py:22-49 + the anndata zarr v2 on-disk spec (dataframe /
categorical / csr_matrix encodings), io_points.py:23-47, and the zarr v2
storage spec (zlib-compressed C-order chunks, vlen-utf8 object arrays).

All values are deterministic functulas of the row index so DuckDB oracles can
recompute them from range() without reading the fixture.

Run from the repo root: python3 tools/make_ref_fixture.py
"""
import json
import os
import shutil
import struct
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ROOT = os.path.join("src", "test", "resources", "refstore")

DT = {
    np.dtype("float64"): "<f8", np.dtype("float32"): "<f4",
    np.dtype("int64"): "<i8", np.dtype("int32"): "<i4",
    np.dtype("int16"): "<i2", np.dtype("int8"): "|i1",
    np.dtype("uint8"): "|u1", np.dtype("bool"): "|b1",
}


def write_json(path, obj):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(obj, f, indent=2)


def write_group(path, attrs=None):
    write_json(os.path.join(path, ".zgroup"), {"zarr_format": 2})
    if attrs is not None:
        write_json(os.path.join(path, ".zattrs"), attrs)


def write_array(path, arr, chunks=None, skip_chunks=(), sep="."):
    """Numeric zarr v2 array, zlib level 1, C order. `skip_chunks` chunk
    indices are left absent (zarr semantics: those cells read as fill_value);
    `sep="/"` writes the nested chunk layout (dimension_separator "/").
    """
    arr = np.ascontiguousarray(arr)
    if chunks is None:
        chunks = list(arr.shape)
    meta = {
        "zarr_format": 2, "shape": list(arr.shape), "chunks": list(chunks),
        "dtype": DT[arr.dtype], "compressor": {"id": "zlib", "level": 1},
        "fill_value": 0, "order": "C", "filters": None,
        "dimension_separator": sep,
    }
    write_json(os.path.join(path, ".zarray"), meta)
    grid = [(s + c - 1) // c for s, c in zip(arr.shape, chunks)]
    for idx in np.ndindex(*grid):
        if tuple(idx) in set(map(tuple, skip_chunks)):
            continue
        sl = tuple(slice(i * c, (i + 1) * c) for i, c in zip(idx, chunks))
        block = arr[sl]
        full = np.zeros(chunks, dtype=arr.dtype)
        full[tuple(slice(0, s) for s in block.shape)] = block
        fp = os.path.join(path, sep.join(map(str, idx)))
        os.makedirs(os.path.dirname(fp), exist_ok=True)
        with open(fp, "wb") as f:
            f.write(zlib.compress(full.tobytes(), 1))


def write_str_array(path, strings, chunks=None):
    """Object array with the numcodecs vlen-utf8 filter."""
    n = len(strings)
    if chunks is None:
        chunks = [n]
    meta = {
        "zarr_format": 2, "shape": [n], "chunks": list(chunks),
        "dtype": "|O", "compressor": {"id": "zlib", "level": 1},
        "fill_value": 0, "order": "C",
        "filters": [{"id": "vlen-utf8"}],
    }
    write_json(os.path.join(path, ".zarray"), meta)
    c = chunks[0]
    for ci in range((n + c - 1) // c):
        items = strings[ci * c:(ci + 1) * c]
        buf = struct.pack("<I", len(items))
        for s in items:
            b = s.encode("utf-8")
            buf += struct.pack("<I", len(b)) + b
        with open(os.path.join(path, str(ci)), "wb") as f:
            f.write(zlib.compress(buf, 1))


def cs(name):
    axes = [{"name": "x", "type": "space", "unit": "unit"},
            {"name": "y", "type": "space", "unit": "unit"}]
    return {"name": name, "axes": axes}


def ngff_identity():
    return {"type": "identity", "input": cs("xy"), "output": cs("global")}


def ngff_scale(sx, sy):
    return {"type": "scale", "scale": [sx, sy],
            "input": cs("xy"), "output": cs("global")}


def shapes_attrs_v01(geos_name, geos_type, transform):
    return {
        "encoding-type": "ngff:shapes", "axes": ["x", "y"],
        "coordinateTransformations": [transform],
        "spatialdata_attrs": {
            "geos": {"name": geos_name, "type": geos_type}, "version": "0.1"},
    }


def categorical(path, codes, categories):
    write_group(path, {"encoding-type": "categorical",
                       "encoding-version": "0.2.0", "ordered": False})
    write_array(os.path.join(path, "codes"), np.asarray(codes, dtype=np.int8))
    write_str_array(os.path.join(path, "categories"), categories)


def obs_attrs(order):
    return {"encoding-type": "dataframe", "encoding-version": "0.2.0",
            "_index": "_index", "column-order": order}


def main():
    shutil.rmtree(ROOT, ignore_errors=True)
    write_group(ROOT, {"spatialdata_attrs": {
        "version": "0.1", "spatialdata_software_version": "0.4.0"}})
    write_group(os.path.join(ROOT, "shapes"))
    write_group(os.path.join(ROOT, "tables"))
    write_group(os.path.join(ROOT, "points"))

    # ---- shapes/circles_v01: POINT + radius ----
    n = 40
    i = np.arange(n)
    coords = np.stack([(i * 7) % 50 + 0.5, (i * 3) % 40 + 0.5], axis=1).astype(np.float64)
    d = os.path.join(ROOT, "shapes", "circles_v01")
    write_group(d, shapes_attrs_v01("POINT", 0, ngff_identity()))
    write_array(os.path.join(d, "coords"), coords, chunks=[16, 2])
    write_array(os.path.join(d, "Index"), i.astype(np.int64), chunks=[16])
    write_array(os.path.join(d, "radius"), (1.0 + (i % 5)).astype(np.float64), chunks=[16])

    # ---- shapes/polys_v01: POLYGON rectangles, poly 3 has a 1x1 hole ----
    np_ = 30
    coords_l, ring_off, geom_off = [], [0], [0]
    for k in range(np_):
        x0, y0 = float((k * 5) % 60), float((k * 11) % 45)
        w, h = 3.0 + (k % 4), 2.0 + (k % 3)
        coords_l += [(x0, y0), (x0 + w, y0), (x0 + w, y0 + h), (x0, y0 + h), (x0, y0)]
        ring_off.append(len(coords_l))
        if k == 3:  # interior ring (hole), CW
            coords_l += [(x0 + 1, y0 + 1), (x0 + 1, y0 + 2), (x0 + 2, y0 + 2),
                         (x0 + 2, y0 + 1), (x0 + 1, y0 + 1)]
            ring_off.append(len(coords_l))
        geom_off.append(len(ring_off) - 1)
    d = os.path.join(ROOT, "shapes", "polys_v01")
    write_group(d, shapes_attrs_v01("POLYGON", 3, ngff_identity()))
    write_array(os.path.join(d, "coords"), np.array(coords_l, dtype=np.float64), chunks=[32, 2])
    write_array(os.path.join(d, "offset0"), np.array(ring_off, dtype=np.int64), chunks=[16])
    write_array(os.path.join(d, "offset1"), np.array(geom_off, dtype=np.int64), chunks=[16])
    write_array(os.path.join(d, "Index"), np.arange(np_, dtype=np.int64), chunks=[16])

    # ---- shapes/mpolys_v01: MULTIPOLYGON (two unit squares each), i4 offsets ----
    nm = 10
    coords_l, ring_off, poly_off, geom_off = [], [0], [0], [0]
    for k in range(nm):
        for bx, by in ((k * 7.0, 0.0), (k * 7.0 + 3.0, 5.0)):
            coords_l += [(bx, by), (bx + 1, by), (bx + 1, by + 1), (bx, by + 1), (bx, by)]
            ring_off.append(len(coords_l))
            poly_off.append(len(ring_off) - 1)
        geom_off.append(len(poly_off) - 1)
    d = os.path.join(ROOT, "shapes", "mpolys_v01")
    write_group(d, shapes_attrs_v01("MULTIPOLYGON", 6, ngff_identity()))
    write_array(os.path.join(d, "coords"), np.array(coords_l, dtype=np.float64), chunks=[64, 2])
    write_array(os.path.join(d, "offset0"), np.array(ring_off, dtype=np.int32))
    write_array(os.path.join(d, "offset1"), np.array(poly_off, dtype=np.int32))
    write_array(os.path.join(d, "offset2"), np.array(geom_off, dtype=np.int32))
    write_array(os.path.join(d, "Index"), np.arange(nm, dtype=np.int64))

    # ---- shapes/gp_v02: single-file GeoParquet, WKB rectangles ----
    def wkb_polygon(rings):
        b = struct.pack("<BI", 1, 3) + struct.pack("<I", len(rings))
        for r in rings:
            b += struct.pack("<I", len(r))
            for x, y in r:
                b += struct.pack("<dd", x, y)
        return b

    ng = 20
    geoms = []
    for k in range(ng):
        x0, y0 = k * 2.0, float(k)
        geoms.append(wkb_polygon([[(x0, y0), (x0 + 2, y0), (x0 + 2, y0 + 1),
                                   (x0, y0 + 1), (x0, y0)]]))
    d = os.path.join(ROOT, "shapes", "gp_v02")
    write_group(d, {
        "encoding-type": "ngff:shapes", "axes": ["x", "y"],
        "coordinateTransformations": [ngff_scale(2.0, 2.0)],
        "spatialdata_attrs": {"version": "0.2"},
    })
    geo_md = {"version": "1.0.0", "primary_column": "geometry",
              "columns": {"geometry": {"encoding": "WKB",
                                       "geometry_types": ["Polygon"]}}}
    tbl = pa.table({"index": pa.array(np.arange(ng, dtype=np.int64)),
                    "geometry": pa.array(geoms, type=pa.binary())})
    tbl = tbl.replace_schema_metadata({"geo": json.dumps(geo_md)})
    pq.write_table(tbl, os.path.join(d, "shapes.parquet"))

    # ---- shapes/ga_v03: geoarrow-encoded GeoParquet (ShapesFormatV03,
    # geometry_encoding="geoarrow": list<list<struct<x,y>>> polygons) ----
    nga = 15
    pt = pa.struct([("x", pa.float64()), ("y", pa.float64())])
    polys = []
    for k in range(nga):
        x0, y0 = k * 4.0, 2.0 * k
        ring = [{"x": x0, "y": y0}, {"x": x0 + 3, "y": y0},
                {"x": x0 + 3, "y": y0 + 1}, {"x": x0, "y": y0 + 1},
                {"x": x0, "y": y0}]
        polys.append([ring])
    d = os.path.join(ROOT, "shapes", "ga_v03")
    write_group(d, {
        "encoding-type": "ngff:shapes", "axes": ["x", "y"],
        "coordinateTransformations": [ngff_identity()],
        "spatialdata_attrs": {"version": "0.3"},
    })
    ga_md = {"version": "1.1.0", "primary_column": "geometry",
             "columns": {"geometry": {"encoding": "polygon",
                                      "geometry_types": ["Polygon"]}}}
    tbl = pa.table({"index": pa.array(np.arange(nga, dtype=np.int64)),
                    "geometry": pa.array(polys, type=pa.list_(pa.list_(pt)))})
    tbl = tbl.replace_schema_metadata({"geo": json.dumps(ga_md)})
    pq.write_table(tbl, os.path.join(d, "shapes.parquet"))

    # ---- tables/t_dense: AnnData zarr, dense X ----
    no, nv = 50, 4
    i = np.arange(no)
    d = os.path.join(ROOT, "tables", "t_dense")
    write_group(d, {
        "encoding-type": "anndata", "encoding-version": "0.1.0",
        "spatialdata-encoding-type": "ngff:regions_table",
        "region": "polys_v01", "region_key": "region",
        "instance_key": "instance_id", "version": "0.1",
    })
    X = ((i[:, None] * nv + np.arange(nv)[None, :]) % 7).astype(np.float64)
    write_array(os.path.join(d, "X"), X, chunks=[16, 4])
    ld = os.path.join(d, "layers")
    write_group(ld, {"encoding-type": "dict", "encoding-version": "0.1.0"})
    counts = ((i[:, None] + 2 * np.arange(nv)[None, :]) % 4).astype(np.float64)
    write_array(os.path.join(ld, "counts"), counts, chunks=[16, 4])
    od = os.path.join(d, "obs")
    write_group(od, obs_attrs(["region", "instance_id", "score", "grp", "flag"]))
    write_str_array(os.path.join(od, "_index"), [f"cell_{k}" for k in i], chunks=[16])
    categorical(os.path.join(od, "region"), np.zeros(no, np.int8), ["polys_v01"])
    write_array(os.path.join(od, "instance_id"), i.astype(np.int64), chunks=[16])
    write_array(os.path.join(od, "score"), (i * 0.5).astype(np.float64), chunks=[16])
    categorical(os.path.join(od, "grp"), (i % 3).astype(np.int8), ["a", "b", "c"])
    write_array(os.path.join(od, "flag"), (i % 2 == 0), chunks=[16])
    vd = os.path.join(d, "var")
    write_group(vd, obs_attrs([]))
    write_str_array(os.path.join(vd, "_index"), [f"g{j}" for j in range(nv)])
    md = os.path.join(d, "obsm")
    write_group(md)
    # nested chunk layout ("/" dimension_separator, OME-zarr v0.4 style) —
    # the existing obsm assertions + q74 gates prove the reader handles it
    spatial = np.stack([i * 2.0, i + 0.25], axis=1).astype(np.float64)
    write_array(os.path.join(md, "spatial"), spatial, chunks=[16, 2], sep="/")
    # pcs: chunk (2,0) (rows 32-47) deliberately ABSENT — instances must
    # still resolve to fill_value 0.0, not vanish from the wide frame
    pcs = np.where((i[:, None] // 16 == 2), 0.0,
                   np.stack([i + 0.5, i * 3.0], axis=1)).astype(np.float64)
    write_array(os.path.join(md, "pcs"), pcs, chunks=[16, 2],
                skip_chunks=[(2, 0)])
    # emb: 80 columns — wider than the pivot threshold (MaxObsmWidth=64);
    # the reference reads embedding-sized obsm fine, so the reader must take
    # the map-aggregate wide path instead of failing the table read
    ke = 80
    emb = (i[:, None] * 0.5 + np.arange(ke)[None, :] * 0.125).astype(np.float64)
    write_array(os.path.join(md, "emb"), emb, chunks=[16, 40])
    # obsp/knn: pairwise (n_obs x n_obs) CSR neighbor graph — row k links to
    # (k+1)%50 with weight k+0.5 and (k+7)%50 with weight k*0.25+1.0
    # (anndata stores neighbor/distance graphs here; the reference reads
    # them through anndata, io_table.py:22-49)
    pd_ = os.path.join(d, "obsp")
    write_group(pd_, {"encoding-type": "dict", "encoding-version": "0.1.0"})
    data, indices, indptr = [], [], [0]
    for k in range(no):
        ents = sorted([((k + 1) % no, k + 0.5), ((k + 7) % no, k * 0.25 + 1.0)])
        for c, v in ents:
            indices.append(c)
            data.append(v)
        indptr.append(len(data))
    kd = os.path.join(pd_, "knn")
    write_group(kd, {"encoding-type": "csr_matrix", "encoding-version": "0.1.0",
                     "shape": [no, no]})
    write_array(os.path.join(kd, "data"), np.array(data, dtype=np.float64), chunks=[32])
    write_array(os.path.join(kd, "indices"), np.array(indices, dtype=np.int32), chunks=[32])
    write_array(os.path.join(kd, "indptr"), np.array(indptr, dtype=np.int64), chunks=[16])
    # varm/loadings: per-var (n_var x k) matrix (PCA loadings live here)
    vmd = os.path.join(d, "varm")
    write_group(vmd, {"encoding-type": "dict", "encoding-version": "0.1.0"})
    j = np.arange(nv)
    loadings = np.stack([j * 1.5 + 0.5, 10.0 - j, j * j * 0.25], axis=1).astype(np.float64)
    write_array(os.path.join(vmd, "loadings"), loadings, chunks=[2, 3])

    # ---- tables/t_csr: AnnData zarr, CSR X ----
    no, nv = 30, 3
    i = np.arange(no)
    d = os.path.join(ROOT, "tables", "t_csr")
    write_group(d, {
        "encoding-type": "anndata", "encoding-version": "0.1.0",
        "spatialdata-encoding-type": "ngff:regions_table",
        "region": "circles_v01", "region_key": "region",
        "instance_key": "instance_id", "version": "0.1",
    })
    data, indices, indptr = [], [], [0]
    for k in range(no):
        ents = sorted([(k % 3, k + 0.5), ((k + 1) % 3, 2 * k + 0.25)])
        for c, v in ents:
            indices.append(c)
            data.append(v)
        indptr.append(len(data))
    xd = os.path.join(d, "X")
    write_group(xd, {"encoding-type": "csr_matrix", "encoding-version": "0.1.0",
                     "shape": [no, nv]})
    write_array(os.path.join(xd, "data"), np.array(data, dtype=np.float64), chunks=[16])
    write_array(os.path.join(xd, "indices"), np.array(indices, dtype=np.int32), chunks=[16])
    write_array(os.path.join(xd, "indptr"), np.array(indptr, dtype=np.int64), chunks=[8])
    od = os.path.join(d, "obs")
    write_group(od, obs_attrs(["region", "instance_id"]))
    write_str_array(os.path.join(od, "_index"), [f"r_{k}" for k in i])
    write_str_array(os.path.join(od, "region"), ["circles_v01"] * no)
    write_array(os.path.join(od, "instance_id"), i.astype(np.int64))
    vd = os.path.join(d, "var")
    write_group(vd, obs_attrs([]))
    write_str_array(os.path.join(vd, "_index"), [f"v{j}" for j in range(nv)])

    # ---- tables/t_csc: AnnData zarr, CSC X (indptr over COLUMNS) ----
    no, nv = 24, 3
    i = np.arange(no)
    d = os.path.join(ROOT, "tables", "t_csc")
    write_group(d, {
        "encoding-type": "anndata", "encoding-version": "0.1.0",
        "spatialdata-encoding-type": "ngff:regions_table",
        "region": "polys_v01", "region_key": "region",
        "instance_key": "instance_id", "version": "0.1",
    })
    data, indices, indptr = [], [], [0]
    for j in range(nv):          # column-major nonzeros: X[k][j] = (k + 2j) % 5
        for k in range(no):
            v = (k + 2 * j) % 5
            if v:
                data.append(float(v))
                indices.append(k)
        indptr.append(len(data))
    xd = os.path.join(d, "X")
    write_group(xd, {"encoding-type": "csc_matrix", "encoding-version": "0.1.0",
                     "shape": [no, nv]})
    write_array(os.path.join(xd, "data"), np.array(data, dtype=np.float64), chunks=[16])
    write_array(os.path.join(xd, "indices"), np.array(indices, dtype=np.int32), chunks=[16])
    write_array(os.path.join(xd, "indptr"), np.array(indptr, dtype=np.int64), chunks=[2])
    od = os.path.join(d, "obs")
    write_group(od, obs_attrs(["region", "instance_id", "ok", "nn", "nb"]))
    write_str_array(os.path.join(od, "_index"), [f"c_{k}" for k in i])
    write_str_array(os.path.join(od, "region"), ["polys_v01"] * no)
    write_array(os.path.join(od, "instance_id"), i.astype(np.int64))
    write_array(os.path.join(od, "ok"), (i % 3 == 0))
    # pandas extension dtypes: values + mask groups (mask true = missing)
    nnd = os.path.join(od, "nn")
    write_group(nnd, {"encoding-type": "nullable-integer",
                      "encoding-version": "0.1.0"})
    write_array(os.path.join(nnd, "values"), (i * 2).astype(np.int64))
    write_array(os.path.join(nnd, "mask"), (i % 5 == 0))
    nbd = os.path.join(od, "nb")
    write_group(nbd, {"encoding-type": "nullable-boolean",
                      "encoding-version": "0.1.0"})
    write_array(os.path.join(nbd, "values"), (i % 2 == 1))
    write_array(os.path.join(nbd, "mask"), (i % 7 == 0))
    vd = os.path.join(d, "var")
    write_group(vd, obs_attrs([]))
    write_str_array(os.path.join(vd, "_index"), [f"v{j}" for j in range(nv)])

    # ---- points/pts_v01 ----
    npt = 25
    i = np.arange(npt)
    d = os.path.join(ROOT, "points", "pts_v01")
    write_group(d, {
        "encoding-type": "ngff:points", "axes": ["x", "y"],
        "coordinateTransformations": [ngff_identity()],
        "spatialdata_attrs": {"instance_key": "instance", "version": "0.1"},
    })
    # dask to_parquet layout: a DIRECTORY of part.N.parquet files plus
    # _metadata/_common_metadata sidecars (readers must skip '_'-prefixed
    # files, which Spark's parquet source does by default)
    pdir = os.path.join(d, "points.parquet")
    os.makedirs(pdir, exist_ok=True)
    tbl = pa.table({
        "x": pa.array((i * 1.5).astype(np.float64)),
        "y": pa.array((i * 0.5).astype(np.float64)),
        "instance": pa.array(i.astype(np.int64)),
    })
    pq.write_table(tbl.slice(0, 15), os.path.join(pdir, "part.0.parquet"))
    pq.write_table(tbl.slice(15), os.path.join(pdir, "part.1.parquet"))
    pq.write_metadata(tbl.schema, os.path.join(pdir, "_common_metadata"))
    pq.write_metadata(tbl.schema, os.path.join(pdir, "_metadata"))

    # ---- GeoJSON ingest fixtures (reference ShapesModel.parse(path),
    # models.py:624-649; tests/data/*.json are GeometryCollections) ----
    gj = os.path.join("src", "test", "resources", "geojson")
    shutil.rmtree(gj, ignore_errors=True)
    os.makedirs(gj, exist_ok=True)

    def rect(x0, y0, w, h):
        return [[x0, y0], [x0 + w, y0], [x0 + w, y0 + h], [x0, y0 + h], [x0, y0]]

    geoms = []
    for k in range(18):
        x0, y0, w, h = k * 3.0, float(k), 2.0 + k % 3, 1.0 + k % 2
        rings = [rect(x0, y0, w, h)]
        if k == 5:  # 0.5x0.5 hole, CW
            rings.append([[x0 + 0.5, y0 + 0.25], [x0 + 0.5, y0 + 0.75],
                          [x0 + 1.0, y0 + 0.75], [x0 + 1.0, y0 + 0.25],
                          [x0 + 0.5, y0 + 0.25]])
        geoms.append({"type": "Polygon", "coordinates": rings})
    write_json(os.path.join(gj, "gc.json"),
               {"type": "GeometryCollection", "geometries": geoms})

    feats = [{"type": "Feature", "properties": {},
              "geometry": {"type": "Point",
                           "coordinates": [k * 2.5, k + 0.5]}}
             for k in range(10)]
    write_json(os.path.join(gj, "points.json"),
               {"type": "FeatureCollection", "features": feats})

    with open(os.path.join(gj, "features.ndjson"), "w") as f:
        for k in range(12):
            f.write(json.dumps({"type": "Feature", "properties": {},
                                "geometry": {"type": "Polygon",
                                             "coordinates": [rect(k * 4.0, 0.0, 2.0, 3.0)]}})
                    + "\n")

    print(f"wrote {ROOT} and {gj}")


if __name__ == "__main__":
    main()
