"""OSM PBF ingest (S4) — no osmium/protobuf ships in this environment, so
this is a minimal pure-numpy decoder for the public OSM PBF format
(https://wiki.openstreetmap.org/wiki/PBF_Format): length-prefixed
BlobHeader/Blob framing, zlib blocks, PrimitiveBlock string tables,
DenseNodes and Ways with delta-coded packed varints.

Reference behavior reproduced: the two-pass highway ingest
`osm_merge/utilities/osmhighways.py:262-294` / `tm_splitter.py:461-497`
(KeyFilter-style tag filtering happens downstream as a Column predicate) and
the tiger:* drop applied by the XML path (`osm_merge/osmfile.py:152-156`) so
both ingest paths produce identical rows.

Scale design: a planet .pbf is one huge file, but blobs are independently
decodable — ``blob_index`` scans ONLY the ~13-byte headers (seek-skip, no
decompression) to build an (offset, size) work list, which then fans out as
a DataFrame; each task range-reads and decodes its own blobs.  That is the
same split model Spark uses for natively splittable formats, built at the
ingest boundary.  The packed-varint hot loops are numpy-vectorized
(byte-mask → group-prefix-sum), not per-byte Python.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .files import _OSM_ROW_SCHEMA

# ---------------------------------------------------------------------------
# Minimal protobuf wire-format helpers
# ---------------------------------------------------------------------------


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    out = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7


def _fields(buf: bytes) -> Iterator[tuple[int, int, object]]:
    """Iterate (field_no, wire_type, value) over one protobuf message.
    value: int for varint(0)/fixed(1,5), bytes for length-delimited(2)."""
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if wire == 0:
            val, pos = _read_varint(buf, pos)
        elif wire == 2:
            ln, pos = _read_varint(buf, pos)
            val = buf[pos : pos + ln]
            pos += ln
        elif wire == 5:
            val = struct.unpack_from("<I", buf, pos)[0]
            pos += 4
        elif wire == 1:
            val = struct.unpack_from("<Q", buf, pos)[0]
            pos += 8
        else:  # groups are not used by OSM PBF
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, val


def decode_packed_varints(buf: bytes) -> np.ndarray:
    """Vectorized packed-varint decode: continuation-bit mask → per-varint
    group ids via prefix sum → 7-bit limbs OR-merged by position."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.int64)
    ends = (b & 0x80) == 0
    group = np.zeros(b.size, dtype=np.int64)
    group[1:] = np.cumsum(ends[:-1])
    starts = np.concatenate(([0], np.nonzero(ends)[0][:-1] + 1))
    pos_in_group = np.arange(b.size) - starts[group]
    limbs = (b & 0x7F).astype(np.uint64) << (7 * pos_in_group.astype(np.uint64))
    out = np.zeros(int(ends.sum()), dtype=np.uint64)
    np.bitwise_or.at(out, group, limbs)
    return out.view(np.int64)


def _zigzag(v: np.ndarray) -> np.ndarray:
    u = v.view(np.uint64) if v.dtype != np.uint64 else v
    return ((u >> np.uint64(1)).astype(np.int64)) ^ -(v & 1)


def decode_packed_sint_delta(buf: bytes) -> np.ndarray:
    """packed sint64 with per-element delta coding (ids/lats/lons/refs)."""
    return np.cumsum(_zigzag(decode_packed_varints(buf)))


# ---------------------------------------------------------------------------
# Blob framing
# ---------------------------------------------------------------------------


def blob_index(path: str) -> list[tuple[int, int, str]]:
    """Scan ONLY the blob headers: [(payload_offset, payload_size, type)].
    O(#blobs) seeks, no decompression — the driver-side work list."""
    out = []
    with open(path, "rb") as f:
        while True:
            head = f.read(4)
            if len(head) < 4:
                break
            hlen = struct.unpack(">I", head)[0]
            header = f.read(hlen)
            btype, dsize = "", 0
            for field, _w, val in _fields(header):
                if field == 1:
                    btype = val.decode()
                elif field == 3:
                    dsize = val
            off = f.tell()
            out.append((off, dsize, btype))
            f.seek(off + dsize)
    return out


def _blob_payload(raw: bytes) -> bytes:
    for field, _w, val in _fields(raw):
        if field == 1:  # raw
            return val
        if field == 3:  # zlib_data
            return zlib.decompress(val)
    return b""


# ---------------------------------------------------------------------------
# PrimitiveBlock decoding
# ---------------------------------------------------------------------------

_JUNK_PREFIX = "tiger:"


def _decode_primitive_block(payload: bytes) -> list[tuple]:
    strings: list[str] = []
    groups: list[bytes] = []
    granularity, lat_off, lon_off = 100, 0, 0
    for field, _w, val in _fields(payload):
        if field == 1:  # stringtable
            strings = [s.decode("utf-8", "replace") for _f, _ww, s in _fields(val) if _f == 1]
        elif field == 2:
            groups.append(val)
        elif field == 17:
            granularity = val
        elif field == 19:
            lat_off = val
        elif field == 20:
            lon_off = val
    rows: list[tuple] = []
    for g in groups:
        for field, _w, val in _fields(g):
            if field == 2:  # DenseNodes
                ids = lats = lons = np.empty(0, dtype=np.int64)
                kv = np.empty(0, dtype=np.int64)
                for f2, _w2, v2 in _fields(val):
                    if f2 == 1:
                        ids = decode_packed_sint_delta(v2)
                    elif f2 == 8:
                        lats = decode_packed_sint_delta(v2)
                    elif f2 == 9:
                        lons = decode_packed_sint_delta(v2)
                    elif f2 == 10:
                        kv = decode_packed_varints(v2)
                lat_deg = 1e-9 * (lat_off + granularity * lats)
                lon_deg = 1e-9 * (lon_off + granularity * lons)
                tags_per = _dense_tags(kv, strings, len(ids))
                for i in range(len(ids)):
                    rows.append((int(ids[i]), "node", 1, float(lon_deg[i]), float(lat_deg[i]), [], tags_per[i]))
            elif field == 3:  # Way
                wid, keys, vals, refs = 0, np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.int64)
                version = 1
                for f2, _w2, v2 in _fields(val):
                    if f2 == 1:
                        wid = v2
                    elif f2 == 2:
                        keys = decode_packed_varints(v2)
                    elif f2 == 3:
                        vals = decode_packed_varints(v2)
                    elif f2 == 8:
                        refs = decode_packed_sint_delta(v2)
                tags = {
                    strings[k]: strings[v]
                    for k, v in zip(keys, vals)
                    if not strings[k].startswith(_JUNK_PREFIX)
                }
                rows.append((int(wid), "way", version, None, None, refs.tolist(), tags))
            # field 1 (plain Nodes) and 4 (Relations) are rare/skipped — the
            # reference's python path skips relations too
    return rows


def _dense_tags(kv: np.ndarray, strings: list[str], n: int) -> list[dict]:
    """DenseNodes keys_vals: 0-terminated (k,v) id runs per node."""
    out: list[dict] = []
    pos = 0
    for _ in range(n):
        tags: dict[str, str] = {}
        while pos < len(kv) and kv[pos] != 0:
            k, v = strings[int(kv[pos])], strings[int(kv[pos + 1])]
            pos += 2
            if not k.startswith(_JUNK_PREFIX):
                tags[k] = v
        pos += 1  # the 0 terminator
        out.append(tags)
    return out


# ---------------------------------------------------------------------------
# Spark source
# ---------------------------------------------------------------------------


def read_osm_pbf(spark: SparkSession, path: str) -> DataFrame:
    """OSM PBF → the same row shape as ``files.read_osm_xml``.

    The blob index (headers only) is built driver-side; decode fans out over
    (offset, size) ranges so a single planet-scale file parallelizes across
    the cluster exactly like a splittable format."""
    index = [(path, off, size) for off, size, btype in blob_index(path) if btype == "OSMData"]
    work = spark.createDataFrame(index, "path string, off long, size long")
    n = max(min(len(index), spark.sparkContext.defaultParallelism * 2), 1)
    work = work.repartition(n)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in _OSM_ROW_SCHEMA.fields]
        for pdf in batches:
            rows: list[tuple] = []
            for p, off, size in zip(pdf["path"], pdf["off"], pdf["size"]):
                with open(p, "rb") as f:
                    f.seek(int(off))
                    raw = f.read(int(size))
                rows.extend(_decode_primitive_block(_blob_payload(raw)))
            yield pd.DataFrame(rows, columns=cols)

    return work.mapInPandas(run, _OSM_ROW_SCHEMA)
