"""Build a null-enriched copy of an sf dir for the oracle gate.

The r4 driver red row (`codec_for_roundtrip`) came from NULL-bearing rows
in the DRIVER's generated embeddings table that the local /root/testdata
copies don't contain — the local `validate_oracle` run was green while the
driver's gate was not. This tool copies an sf dir into /tmp and appends
rows exercising the null surface the driver's data can carry, so the
local gate reproduces (and keeps reproducing) that divergence class:

- embeddings: NULL list, empty list, NULL element inside a list,
  all-NULL-element list, NULL label
- documents:  NULL text, empty text, NULL lang/source/n_chars
- events:     NULL value, NULL props, NULL event_type, NULL user_id
- lineitem:   NULLs in every ALP-coded decimal column (quantity /
  extendedprice / discount / tax), singly and all-at-once, plus a NULL
  group key (l_returnflag) and a NULL l_shipdate — the forced-alp
  roundtrip (`codec_alp_roundtrip`) and the TPC-H aggregates must agree
  with the oracle when the driver's generated lineitem carries nulls

ids continue past the existing max so dense-id assumptions stay intact;
`ts` stays non-null mid-range (watermark/windowing paths require it in
both engines). All other tables are symlink-copied unchanged.

Usage:  python tools/make_null_fixture.py [src_sf_dir] [dst_dir]
        (defaults: /root/testdata/sf0.01 -> /tmp/owr_nullfix_sf0.01)
"""

from __future__ import annotations

import os
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _append_rows(src: str, dst: str, extra_fn, patch_fn=None) -> int:
    t = pq.read_table(src)
    extra = extra_fn(t)
    if patch_fn is not None:
        t = patch_fn(t)
    pq.write_table(pa.concat_tables([t, extra]), dst)
    return len(extra)


def _patch_cells(t: pa.Table, id_col: str, patches: dict) -> pa.Table:
    """Null-out specific cells of specific LOW-id rows — several queries
    filter to small id ranges (vec_id < 10 / < 200, doc_id < 100), and
    appended high-id rows can never reach those paths."""
    ids = t[id_col].to_pylist()
    for col, bad_ids in patches.items():
        vals = t[col].to_pylist()
        for i, rid in enumerate(ids):
            if rid in bad_ids:
                vals[i] = None
        idx = t.schema.get_field_index(col)
        t = t.set_column(idx, t.schema.field(col),
                         pa.array(vals, type=t.schema.field(col).type))
    return t


def _embeddings_extra(t: pa.Table) -> pa.Table:
    vmax = max(x for x in t["vec_id"].to_pylist() if x is not None)
    dim = next(len(e) for e in t["embedding"].to_pylist() if e)
    rows = [
        {"vec_id": vmax + 1, "embedding": None, "label": 0},
        {"vec_id": vmax + 2, "embedding": [], "label": 1},
        {"vec_id": vmax + 3,
         "embedding": [0.5 if i % 3 else None for i in range(dim)],
         "label": 2},
        {"vec_id": vmax + 4, "embedding": [None] * dim, "label": None},
        {"vec_id": vmax + 5, "embedding": [1.25] * dim, "label": None},
    ]
    return pa.Table.from_pylist(rows, schema=t.schema)


def _documents_extra(t: pa.Table) -> pa.Table:
    dmax = max(x for x in t["doc_id"].to_pylist() if x is not None)
    rows = [
        {"doc_id": dmax + 1, "text": None, "lang": "en",
         "source": "web", "n_chars": None},
        {"doc_id": dmax + 2, "text": "", "lang": None,
         "source": None, "n_chars": 0},
        {"doc_id": dmax + 3, "text": "null surface probe",
         "lang": None, "source": "web", "n_chars": 18},
    ]
    return pa.Table.from_pylist(rows, schema=t.schema)


def _events_extra(t: pa.Table) -> pa.Table:
    emax = max(x for x in t["event_id"].to_pylist() if x is not None)
    ts = sorted(x for x in t["ts"].to_pylist() if x is not None)
    mid = ts[len(ts) // 2]
    rows = [
        {"event_id": emax + 1, "ts": mid, "user_id": 1,
         "event_type": None, "value": None, "props": None},
        {"event_id": emax + 2, "ts": mid, "user_id": None,
         "event_type": "click", "value": 0.0, "props": None},
        {"event_id": emax + 3, "ts": mid, "user_id": 2,
         "event_type": "view", "value": None, "props": "{}"},
    ]
    return pa.Table.from_pylist(rows, schema=t.schema)


def _lineitem_extra(t: pa.Table) -> pa.Table:
    okmax = max(t["l_orderkey"].to_pylist())
    dates = sorted(x for x in t["l_shipdate"].to_pylist() if x is not None)
    mid = dates[len(dates) // 2]
    base = {"l_orderkey": okmax + 1, "l_partkey": 1, "l_suppkey": 1,
            "l_quantity": 10.0, "l_extendedprice": 1234.56,
            "l_discount": 0.05, "l_tax": 0.04, "l_returnflag": "N",
            "l_linestatus": "O", "l_shipdate": mid}
    rows = []
    # one row per singly-nulled ALP column, then all four at once
    for i, col in enumerate(["l_quantity", "l_extendedprice",
                             "l_discount", "l_tax"]):
        rows.append({**base, "l_linenumber": i + 1, col: None})
    rows.append({**base, "l_linenumber": 5, "l_quantity": None,
                 "l_extendedprice": None, "l_discount": None, "l_tax": None})
    # NULL group key and NULL filter column (range predicates must agree)
    rows.append({**base, "l_linenumber": 6, "l_returnflag": None})
    rows.append({**base, "l_linenumber": 7, "l_shipdate": None})
    return pa.Table.from_pylist(rows, schema=t.schema)


EXTRAS = {"embeddings": _embeddings_extra,
          "documents": _documents_extra,
          "events": _events_extra,
          "lineitem": _lineitem_extra}

# low-id cells nulled in place so id-filtered query paths see nulls too:
# vec_id 7 hits the ann query side (vec_id < 10), 150 the bounded
# near-dup subsample (vec_id < 200), doc_id 42 the explode path (< 100)
PATCHES = {"embeddings": ("vec_id", {"embedding": {7, 150}}),
           "documents": ("doc_id", {"text": {42}})}


def build(src_dir: str, dst_dir: str) -> str:
    os.makedirs(dst_dir, exist_ok=True)
    for t in TABLES:
        src = os.path.join(src_dir, f"{t}.parquet")
        dst = os.path.join(dst_dir, f"{t}.parquet")
        if os.path.exists(dst):
            os.remove(dst)
        if t in EXTRAS:
            patch = None
            if t in PATCHES:
                id_col, cols = PATCHES[t]
                patch = lambda tb, ic=id_col, cs=cols: _patch_cells(tb, ic, cs)
            n = _append_rows(src, dst, EXTRAS[t], patch)
            print(f"{t}: +{n} null-surface rows"
                  + (f", patched {PATCHES[t][1]}" if t in PATCHES else ""))
        else:
            shutil.copyfile(src, dst)
    return dst_dir


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    dst = sys.argv[2] if len(sys.argv) > 2 else \
        "/tmp/owr_nullfix_" + os.path.basename(src.rstrip("/"))
    print(build(src, dst))
