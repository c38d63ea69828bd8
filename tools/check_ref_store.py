#!/usr/bin/env python3
"""Independent pure-python validator for RefStoreWriter output.

Reads a container written by `graft.sources.RefStoreWriter` exactly the way
the reference stack would — zarr v2 JSON metadata + zlib chunks + vlen-utf8
strings for the AnnData table, pyarrow + `geo` footer metadata for the
GeoParquet shapes — WITHOUT any graft/JVM code, proving the bytes are
readable by a foreign implementation.

Usage:  sbt "testOnly graft.sources.RefStoreWriterSpec"   # writes target/ref-demo.zarr
        python3 tools/check_ref_store.py target/ref-demo.zarr
"""
import json
import os
import struct
import sys
import zlib

import numpy as np
import pyarrow.parquet as pq

DT = {"<f8": "<f8", "<i8": "<i8", "<f4": "<f4", "<i4": "<i4", "|b1": "b1"}


def jload(p):
    with open(p) as f:
        return json.load(f)


def blosc_decompress(frame):
    """Pure-python c-blosc1 frame decoder (public README_HEADER layout):
    16-byte header, int32-LE block starts, per-block int32-LE compressed
    length + codec payload; inner codecs zlib (stdlib) / zstd (pyarrow);
    optional byte-shuffle undone with a numpy transpose."""
    version, versionlz, flags, typesize = struct.unpack_from("<BBBB", frame, 0)
    nbytes, blocksize, cbytes = struct.unpack_from("<iii", frame, 4)
    if flags & 0x2:  # pure memcpy
        return bytes(frame[16:16 + nbytes])
    assert not (flags & 0x4), "bit-shuffle unsupported"
    codec = (flags >> 5) & 0x7
    out = bytearray(nbytes)
    nblocks = (nbytes + blocksize - 1) // blocksize
    for b in range(nblocks):
        (bstart,) = struct.unpack_from("<i", frame, 16 + 4 * b)
        neblock = min(blocksize, nbytes - b * blocksize)
        (clen,) = struct.unpack_from("<i", frame, bstart)
        payload = frame[bstart + 4:bstart + 4 + clen]
        if clen == neblock:
            block = bytes(payload)
        elif codec == 3:
            block = zlib.decompress(payload)
        elif codec == 5:
            import pyarrow as pa
            block = pa.Codec("zstd").decompress(payload, neblock).to_pybytes()
        else:
            raise AssertionError(f"unsupported blosc inner codec {codec}")
        if (flags & 0x1) and typesize > 1 and neblock % typesize == 0:
            arr = np.frombuffer(block, dtype="u1")
            block = arr.reshape(typesize, neblock // typesize).T.tobytes()
        out[b * blocksize:b * blocksize + neblock] = block
    return bytes(out)


def decompress_chunk(raw, comp):
    cid = comp.get("id")
    if cid == "zlib":
        return zlib.decompress(raw)
    if cid == "blosc":
        return blosc_decompress(raw)
    raise AssertionError(f"unsupported compressor {comp}")


def read_array(path):
    meta = jload(os.path.join(path, ".zarray"))
    shape, chunks = meta["shape"], meta["chunks"]
    comp = meta.get("compressor") or {}
    assert comp.get("id") in ("zlib", "blosc"), f"{path}: {comp}"
    filters = meta.get("filters") or []
    is_str = any(f.get("id") == "vlen-utf8" for f in filters)
    if is_str:
        assert len(shape) == 1
        out = []
        for ci in range((shape[0] + chunks[0] - 1) // chunks[0]):
            raw = decompress_chunk(open(os.path.join(path, str(ci)), "rb").read(), comp)
            (n,) = struct.unpack_from("<I", raw, 0)
            # zarr v2 edge chunks are stored at FULL nominal extent — this is
            # what zarr-python's reshape(chunks) enforces on read
            assert n == chunks[0], f"{path} chunk {ci}: {n} items != chunk size {chunks[0]}"
            off = 4
            for _ in range(n):
                (ln,) = struct.unpack_from("<I", raw, off)
                off += 4
                out.append(raw[off:off + ln].decode("utf-8"))
                off += ln
        return out[:shape[0]]
    dtype = np.dtype(DT[meta["dtype"]])
    grid = [(s + c - 1) // c for s, c in zip(shape, chunks)]
    full = np.zeros(shape, dtype=dtype)
    for idx in np.ndindex(*grid):
        key = ".".join(map(str, idx))
        p = os.path.join(path, key)
        if not os.path.exists(p):
            continue
        raw = decompress_chunk(open(p, "rb").read(), comp)
        block = np.frombuffer(raw, dtype=dtype).reshape(chunks)
        sl = tuple(slice(i * c, min((i + 1) * c, s))
                   for i, c, s in zip(idx, chunks, shape))
        full[sl] = block[tuple(slice(0, x.stop - x.start) for x in sl)]
    return full


def read_column(path):
    """Dataframe column: plain array, or anndata `categorical` group."""
    if os.path.exists(os.path.join(path, ".zarray")):
        return read_array(path)
    attrs = jload(os.path.join(path, ".zattrs"))
    assert attrs["encoding-type"] == "categorical", attrs
    codes = read_array(os.path.join(path, "codes"))
    cats = read_array(os.path.join(path, "categories"))
    return [cats[int(c)] if c >= 0 else None for c in codes]


def main(root):
    ok = 0

    # ---- table: AnnData zarr ----
    tdir = os.path.join(root, "tables", "tab")
    g = jload(os.path.join(tdir, ".zattrs"))
    assert g["encoding-type"] == "anndata" and g["region"] == "shp", g
    assert g["region_key"] == "region" and g["instance_key"] == "instance_id"
    obs_attrs = jload(os.path.join(tdir, "obs", ".zattrs"))
    assert obs_attrs["encoding-type"] == "dataframe"
    inst = read_column(os.path.join(tdir, "obs", "instance_id"))
    score = read_column(os.path.join(tdir, "obs", "score"))
    grp = read_column(os.path.join(tdir, "obs", "grp"))
    flag = read_column(os.path.join(tdir, "obs", "flag"))
    assert list(inst) == list(range(12)), inst
    assert all(score[i] == i * 0.5 for i in range(12))
    assert all(grp[i] == f"g{i % 3}" for i in range(12))
    assert all(bool(flag[i]) == (i % 2 == 0) for i in range(12))
    grp_attrs = jload(os.path.join(tdir, "obs", "grp", ".zattrs"))
    assert grp_attrs["encoding-type"] == "categorical", grp_attrs
    # points element must carry .zgroup so zarr group iteration yields it
    assert os.path.isfile(os.path.join(root, "points", "pts", ".zgroup"))
    var_names = read_array(os.path.join(tdir, "var", "_index"))
    assert var_names == ["v0", "v1", "v2"], var_names
    X = read_array(os.path.join(tdir, "X"))
    want = np.array([[(i + j) % 5 for j in range(3)] for i in range(12)], dtype="<f8")
    assert np.array_equal(X, want), X
    layers_attrs = jload(os.path.join(tdir, "layers", ".zattrs"))
    assert layers_attrs["encoding-type"] == "dict", layers_attrs
    L = read_array(os.path.join(tdir, "layers", "counts"))
    lwant = np.array([[(i + 2 * j) % 4 for j in range(3)] for i in range(12)], dtype="<f8")
    assert np.array_equal(L, lwant), L
    obsm_attrs = jload(os.path.join(tdir, "obsm", ".zattrs"))
    assert obsm_attrs["encoding-type"] == "dict", obsm_attrs
    S = read_array(os.path.join(tdir, "obsm", "spatial"))
    swant = np.array([[i * 2.0, i + 0.25] for i in range(12)], dtype="<f8")
    assert np.array_equal(S, swant), S
    ok += 1
    print("OK  tables/tab: anndata group decodes (obs aligned, X + layer + obsm exact)")

    # ---- shapes: single-file GeoParquet ----
    sp = os.path.join(root, "shapes", "shp", "shapes.parquet")
    assert os.path.isfile(sp), "shapes.parquet must be a single file"
    pf = pq.ParquetFile(sp)
    geo = json.loads(pf.metadata.metadata[b"geo"])
    assert geo["primary_column"] == "geometry"
    assert geo["columns"]["geometry"]["encoding"] == "WKB"
    tbl = pf.read().to_pydict()
    assert tbl["index"] == list(range(12))
    for i, wkb in enumerate(tbl["geometry"]):
        bo, typ, nrings, npts = struct.unpack_from("<BIII", wkb, 0)
        assert bo == 1 and typ == 3 and nrings == 1 and npts in (4, 5), (i, typ)
        xs = struct.unpack_from("<" + "d" * (2 * npts), wkb, 13)
        assert xs[0] == i * 3.0 and xs[1] == float(i), (i, xs[:2])
    attrs = jload(os.path.join(root, "shapes", "shp", ".zattrs"))
    t = attrs["coordinateTransformations"][0]
    assert t["type"] == "scale" and t["scale"] == [2.0, 2.0]
    assert t["output"]["name"] == "global"       # reference-style cs objects
    assert t["output"]["axes"][0]["name"] == "x"
    ok += 1
    print("OK  shapes/shp: GeoParquet file + geo metadata + ref-style transform")

    # ---- points ----
    pdir = os.path.join(root, "points", "pts")
    pts = pq.read_table(os.path.join(pdir, "points.parquet")).to_pydict()
    assert sorted(pts["id"]) == list(range(20))
    pattrs = jload(os.path.join(pdir, ".zattrs"))
    assert pattrs["spatialdata_attrs"]["instance_key"] == "id"
    ok += 1
    print("OK  points/pts: parquet + instance_key attrs")

    # ---- optional sibling roots: partitioned + geoarrow shapes forms ----
    parts_root = root.replace("ref-demo.zarr", "ref-demo-parts.zarr")
    if parts_root != root and os.path.isdir(parts_root):
        pdir = os.path.join(parts_root, "shapes", "shp", "shapes.parquet")
        assert os.path.isdir(pdir), "expected partitioned dataset directory"
        parts = [f for f in os.listdir(pdir) if f.endswith(".parquet")]
        assert len(parts) > 1, parts
        geo = json.loads(pq.ParquetFile(
            os.path.join(pdir, parts[0])).metadata.metadata[b"geo"])
        assert geo["columns"]["geometry"]["encoding"] == "WKB"
        merged = pq.read_table(pdir).to_pydict()   # pyarrow dataset read
        assert sorted(merged["index"]) == list(range(12))
        ok += 1
        print("OK  shapes (partitioned): pyarrow dataset read merges part files")

    ga_root = root.replace("ref-demo.zarr", "ref-demo-ga.zarr")
    if ga_root != root and os.path.isdir(ga_root):
        gp = os.path.join(ga_root, "shapes", "shp", "shapes.parquet")
        pf = pq.ParquetFile(gp)
        geo = json.loads(pf.metadata.metadata[b"geo"])
        assert geo["version"] == "1.1.0"
        assert geo["columns"]["geometry"]["encoding"] == "polygon"
        tbl = pf.read().to_pydict()
        assert sorted(tbl["index"]) == list(range(12))
        by_idx = dict(zip(tbl["index"], tbl["geometry"]))
        for i in range(12):
            rings = by_idx[i]
            assert len(rings) == 1 and len(rings[0]) in (4, 5)
            assert rings[0][0] == {"x": i * 3.0, "y": float(i)}, rings[0][0]
        ok += 1
        print("OK  shapes (geoarrow): nested list<list<struct{x,y}>> decodes in pyarrow")

    # ---- optional sibling root: blosc-compressed NGFF raster ----
    blosc_root = root.replace("ref-demo.zarr", "ngff-blosc.zarr")
    if blosc_root != root and os.path.isdir(blosc_root):
        zmeta = jload(os.path.join(blosc_root, "0", ".zarray"))
        comp = zmeta["compressor"]
        assert comp["id"] == "blosc" and comp["cname"] == "zstd" \
            and comp["shuffle"] == 1, comp
        img = read_array(os.path.join(blosc_root, "0"))
        assert img.shape == (1, 24, 16), img.shape
        want = np.zeros((1, 24, 16), dtype="<f8")
        for y in range(20):
            for x in range(12):
                want[0, y, x] = y * 100 + x + 1
        assert np.array_equal(img, want), "blosc NGFF array mismatch"
        ok += 1
        print("OK  ngff-blosc: blosc/zstd+shuffle chunks decode in pure python")

    print(f"\n{ok} element families validated by the pure-python reader")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "target/ref-demo.zarr")
