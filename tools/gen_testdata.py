"""Local testdata generator for scale validation beyond the driver's SFs.

Replicates the driver schema (TESTDATA.md: TPC-H-ish star schema +
events/documents/embeddings) — same column names/types, categorical
vocabularies, value ranges, timestamp encoding (TIMESTAMP(MICROS)
isAdjustedToUTC=false, like the shipped files), and the duplicate /
near-duplicate document structure the dedup queries exercise. Row counts
scale linearly with ``--sf`` (sf=1 -> 6M lineitem).

Parity runs Spark and DuckDB over the SAME files, so distribution
equality with the driver's data is not required — schema + vocabulary +
range fidelity is, and enough mass for plans to be scale-shaped.

    python tools/gen_testdata.py --sf 1 --out /root/repo/.localdata/sf1
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
NATIONS = [
    "ALGERIA", "ARGENTINA", "BRAZIL", "CANADA", "CHINA", "EGYPT",
    "ETHIOPIA", "FRANCE", "GERMANY", "INDIA", "INDONESIA", "IRAN",
    "IRAQ", "JAPAN", "JORDAN", "KENYA", "MOROCCO", "MOZAMBIQUE",
    "PERU", "ROMANIA", "RUSSIA", "SAUDI ARABIA", "UNITED KINGDOM",
    "UNITED STATES", "VIETNAM",
]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["F", "O", "P"]
ETYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["de", "en", "es", "fr", "zh"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
ADJS = ["large", "hot", "blue", "red", "small", "cold", "green", "dark"]
NOUNS = ["ring", "bolt", "gear", "cap", "wheel", "pin", "rod", "plate"]
DOC_VOCAB = (
    "batch part spark line column order small sort fast value scan hash "
    "slow group agg filter query a big key window row table stream merge "
    "data vector join plan shard"
).split()

# ---------------------------------------------------------------------------
# Documents: heavy-tailed (Zipf) token distribution (round-12 verdict,
# Next #2). The original corpus drew uniformly from the 30-word
# DOC_VOCAB, which exhausts its freq>=2 pair structure near 18.7k BPE
# merges — a real corpus has a long tail of rare-but-repeated words, and
# that tail is what lets a 32k vocabulary train at min_frequency>=2.
# Word types: the legacy DOC_VOCAB at the head ranks (so the driver's
# shipped corpus stays in-vocabulary for the pinned tokenizer), then
# deterministic pseudo-words; frequencies ~ rank^-ZIPF_S.
# ---------------------------------------------------------------------------
N_WORD_TYPES = 50_000
ZIPF_S = 1.07


def gen_word_types(rng) -> np.ndarray:
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    words = list(DOC_VOCAB)
    seen = set(words)
    while len(words) < N_WORD_TYPES:
        lens = rng.integers(3, 12, 20_000)
        flat = letters[rng.integers(0, 26, int(lens.sum()))]
        pos = 0
        for ln in lens:
            w = "".join(flat[pos : pos + ln])
            pos += ln
            if w not in seen:
                seen.add(w)
                words.append(w)
                if len(words) == N_WORD_TYPES:
                    break
    return np.array(words)


def gen_documents_texts(rng, n_doc: int) -> list[str]:
    """Zipf-mixture documents of 12-60 words over N_WORD_TYPES types."""
    types = gen_word_types(rng)
    probs = np.arange(1, N_WORD_TYPES + 1, dtype=np.float64) ** -ZIPF_S
    probs /= probs.sum()
    nw = rng.integers(12, 60, n_doc)
    idx = rng.choice(N_WORD_TYPES, int(nw.sum()), p=probs)
    words = types[idx]
    return [
        " ".join(chunk)
        for chunk in np.split(words, np.cumsum(nw)[:-1])
    ]


# ---------------------------------------------------------------------------
# Embeddings: Gaussian-mixture cluster structure + planted near-dup
# pairs (round-12 verdict, Next #3). Uniform random vectors make
# LSH/IVF/PQ recall flattering (everything is equally far from
# everything); clustered data is where trained PQ codebooks and the IVF
# coarse quantizer earn their keep. Labels follow cluster identity so
# label-conditioned queries see real geometry.
# ---------------------------------------------------------------------------
N_EMB_CLUSTERS = 32
EMB_DIM = 64


def gen_embeddings(rng, n_vec: int) -> tuple[np.ndarray, np.ndarray]:
    """(n_vec x 64 float32 vectors, int32 labels) — GMM with Zipf-ish
    mixture weights, within-cluster sigma 0.35 vs center scale 2.0,
    plus planted near-duplicate pairs (every 200th vector copied with
    sigma-0.01 noise -> cosine ~0.9999)."""
    centers = rng.normal(0, 1, (N_EMB_CLUSTERS, EMB_DIM)) * 2.0
    w = np.arange(1, N_EMB_CLUSTERS + 1, dtype=np.float64) ** -1.0
    w /= w.sum()
    cid = rng.choice(N_EMB_CLUSTERS, n_vec, p=w)
    emb = centers[cid] + rng.normal(0, 1, (n_vec, EMB_DIM)) * 0.35
    for i in range(0, n_vec, 200):
        j = (i + 17) % n_vec
        if j != i:
            emb[j] = emb[i] + rng.normal(0, 1, EMB_DIM) * 0.01
            cid[j] = cid[i]
    return emb.astype(np.float32), (cid % 10).astype(np.int32)

EPOCH_1995 = np.datetime64("1995-01-01")
EPOCH_2024 = np.datetime64("2024-01-01")


def money(rng, lo, hi, n):
    return np.round(rng.uniform(lo, hi, n), 2)


def ts_us(days_array_us):
    return pa.array(days_array_us, pa.timestamp("us"))


# Per-table row-group caps. pyarrow's default (1Mi rows/group) leaves
# documents/embeddings as a SINGLE row group even at sf10 (500k/200k
# rows) — and a one-group file is one Spark input split, serializing
# every scan of the compute-heavy-per-row tables regardless of
# maxPartitionBytes. Real deployments never look like that (many files,
# many groups), so cap these tables' groups to keep the generated
# layout scan-parallel; the big fact tables already split fine at the
# default.
_ROW_GROUP = {"documents": 16384, "embeddings": 16384, "events": 262144}


def write(out, name, table):
    pq.write_table(
        table,
        os.path.join(out, f"{name}.parquet"),
        row_group_size=_ROW_GROUP.get(name),
    )
    print(f"  {name}: {table.num_rows} rows")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()
    sf, out = args.sf, args.out
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(args.seed)

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_vec = int(20_000 * sf)
    n_users = int(15_000 * sf)

    write(out, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    write(out, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": NATIONS,
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))
    write(out, "customer", pa.table({
        "c_custkey": pa.array(range(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(
            rng.integers(0, 25, n_cust, dtype=np.int32), pa.int32()
        ),
        "c_acctbal": money(rng, -1000, 10000, n_cust),
        "c_mktsegment": pa.array(
            np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]
        ),
    }))
    write(out, "supplier", pa.table({
        "s_suppkey": pa.array(range(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(
            rng.integers(0, 25, n_supp, dtype=np.int32), pa.int32()
        ),
        "s_acctbal": money(rng, -1000, 10000, n_supp),
    }))
    names = np.array([f"{a} {n}" for a in ADJS for n in NOUNS])
    write(out, "part", pa.table({
        "p_partkey": pa.array(range(n_part), pa.int64()),
        "p_name": pa.array(names[rng.integers(0, len(names), n_part)]),
        "p_brand": pa.array(
            [f"Brand#{i}" for i in rng.integers(1, 26, n_part)]
        ),
        "p_type": pa.array(np.array(PTYPES)[rng.integers(0, 6, n_part)]),
        "p_size": pa.array(
            rng.integers(1, 51, n_part, dtype=np.int32), pa.int32()
        ),
        "p_retailprice": money(rng, 900, 1000, n_part),
    }))

    o_date_days = rng.integers(0, 2405, n_ord)  # 1995-01-01..2001-08-01
    o_date = EPOCH_1995 + o_date_days.astype("timedelta64[D]")
    write(out, "orders", pa.table({
        "o_orderkey": pa.array(range(n_ord), pa.int64()),
        "o_custkey": pa.array(
            rng.integers(0, n_cust, n_ord, dtype=np.int64), pa.int64()
        ),
        "o_orderstatus": pa.array(
            np.array(STATUSES)[rng.choice(3, n_ord, p=[0.48, 0.48, 0.04])]
        ),
        "o_totalprice": money(rng, 1000, 500000, n_ord),
        "o_orderdate": ts_us(o_date.astype("datetime64[us]")),
        "o_orderpriority": pa.array(
            np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]
        ),
    }))

    lines_per = rng.integers(1, 8, n_ord)
    l_orderkey = np.repeat(np.arange(n_ord, dtype=np.int64), lines_per)
    n_li = len(l_orderkey)
    l_linenumber = (
        np.arange(n_li) - np.repeat(np.cumsum(lines_per) - lines_per,
                                    lines_per) + 1
    ).astype(np.int32)
    qty = rng.integers(1, 51, n_li).astype(np.float64)
    ship = (
        np.repeat(o_date_days, lines_per)
        + rng.integers(1, 96, n_li)
    ).astype("timedelta64[D]")
    write(out, "lineitem", pa.table({
        "l_orderkey": pa.array(l_orderkey, pa.int64()),
        "l_partkey": pa.array(
            rng.integers(0, n_part, n_li, dtype=np.int64), pa.int64()
        ),
        "l_suppkey": pa.array(
            rng.integers(0, n_supp, n_li, dtype=np.int64), pa.int64()
        ),
        "l_linenumber": pa.array(l_linenumber, pa.int32()),
        "l_quantity": qty,
        "l_extendedprice": np.round(qty * rng.uniform(900, 2100, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": pa.array(
            np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]
        ),
        "l_linestatus": pa.array(np.array(["F", "O"])[rng.integers(0, 2, n_li)]),
        "l_shipdate": ts_us(
            (EPOCH_1995 + ship).astype("datetime64[us]")
        ),
    }))

    ev_us = np.sort(
        rng.integers(0, 30 * 86_400_000_000, n_ev, dtype=np.int64)
    )
    write(out, "events", pa.table({
        "event_id": pa.array(range(n_ev), pa.int64()),
        "ts": ts_us(
            (EPOCH_2024.astype("datetime64[us]") + ev_us.astype(
                "timedelta64[us]"))
        ),
        "user_id": pa.array(
            rng.integers(0, n_users, n_ev, dtype=np.int64), pa.int64()
        ),
        "event_type": pa.array(np.array(ETYPES)[rng.integers(0, 5, n_ev)]),
        "value": np.round(
            np.minimum(rng.exponential(50, n_ev), 600.0), 2
        ),
        "props": pa.array(
            [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)]
        ),
    }))

    texts = gen_documents_texts(rng, n_doc)
    # duplicate + near-duplicate mass for the dedup/LSH/Jaccard queries
    # (~0.2% exact dups, ~0.1% one-word mutations), as the driver data has
    for i in range(0, n_doc, 500):
        texts[(i + 7) % n_doc] = texts[i]
    for i in range(250, n_doc, 1000):
        w = texts[i].split()
        w[len(w) // 2] = "mutant"
        texts[(i + 13) % n_doc] = " ".join(w)
    write(out, "documents", pa.table({
        "doc_id": pa.array(range(n_doc), pa.int64()),
        "text": texts,
        "lang": pa.array(np.array(LANGS)[rng.integers(0, 5, n_doc)]),
        "source": pa.array(
            [f"src{i}" for i in rng.integers(0, 20, n_doc)]
        ),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    emb, labels = gen_embeddings(rng, n_vec)
    write(out, "embeddings", pa.table({
        "vec_id": pa.array(range(n_vec), pa.int64()),
        "embedding": pa.array(list(emb), pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    }))


if __name__ == "__main__":
    main()
