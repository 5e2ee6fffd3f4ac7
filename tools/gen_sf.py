#!/usr/bin/env python3
"""Scale-probe data generator: synthesizes the TESTDATA.md tables at an
arbitrary scale factor, matching the driver-generated sf0.001/0.01/0.1
sets' schemas and measured marginal distributions (row-count laws, key
ranges, value grids, category sets, planted exact/near-dup rates, the
31-word document vocabulary, unit-norm 64-dim embeddings, nanos event
timestamps). Used for the sf1 scaling probe in BASELINE.md — the driver
sets are read-only and stop at sf0.1.

Usage: python3 tools/gen_sf.py <sf> <outDir> [--vocab heaps]

--vocab heaps swaps the fixed 31-word document vocabulary for a
Heap's-law one (V = 12 * sqrt(total tokens) word types, Zipf s=1.1
frequencies). The fixed vocab makes every shingle's document frequency
scale-invariant — band-collision probability never decays, so every
uncapped LSH audit reads n^2 REGARDLESS of implementation (documented
since r8); the Heaps corpus has a realistic df spread (a few hot stop
words, a long rare tail), separating the data-law from the operator so
uncapped-vs-capped gaps measure the algorithm, not the fixture. All
non-document tables are byte-identical between the two modes.

Distribution notes (measured on /root/testdata/sf0.1, seed there = 42):
  rows: customer 150k*sf, supplier 10k*sf, part 200k*sf, orders 1.5M*sf,
        lineitem 6M*sf, events 1M*sf (15k*sf users), documents
        max(500, 50k*sf), embeddings max(500, 20k*sf)
  orders: status/priority uniform; totalprice ~U(1000, 500000) 2dp;
        orderdate ~U(1995-01-01, 2001-08-01), independent of key
  lineitem: orderkey/partkey/suppkey uniform; linenumber ~U{1..7};
        quantity ~U{1..50}; discount grid 0.00..0.10; tax 0.00..0.08;
        extendedprice ~U(900, 105000) 2dp; shipdate independent of
        orderdate (corr ~0.001), ~orderdate-law + U(1,95) days
  documents: len ~U{10..100} words over the fixed 31-word vocab;
        lang en 40% / zh es fr de 15%; source src0..19 uniform;
        ~5% of docs are 1-2-word mutations of an earlier doc (word
        jaccard 0.9-0.99), ~0.16% exact copies with re-rolled metadata
  events: ts ~U over 2024-01 (30 days), event_id ranks ts; value
        ~Exp(mean 50) 2dp; props {"k": U{0..99}}
  embeddings: iid N(0,1)^64 rows L2-normalized; label ~U{0..9}
"""
import json
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
ADJ = ["small", "large", "hot", "cold", "red", "new", "blue", "old"]
NOUN = ["widget", "gizmo", "ring", "gear", "anvil", "bolt", "plate", "rod"]
TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
STATUS = ["O", "F", "P"]
PRIORITY = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]

DAY_MS = 86400000
ORDER_EPOCH_LO = 788918400000   # 1995-01-01 UTC ms
ORDER_EPOCH_HI = 996624000000   # 2001-08-01 UTC ms
EVENT_EPOCH_LO = 1704067200000000000  # 2024-01-01 UTC ns
EVENT_SPAN_NS = 30 * 86400 * 10**9    # 30 days


def write(out, name, table):
    pq.write_table(table, f"{out}/{name}.parquet")
    print(f"wrote {name}: {table.num_rows} rows")


def gen(sf: float, out: str, seed: int = 42, vocab_mode: str = "fixed",
        chunk_rows: int = 0) -> None:
    rng = np.random.RandomState(seed)
    n_cust = int(150000 * sf)
    n_supp = int(10000 * sf)
    n_part = int(200000 * sf)
    n_ord = int(1500000 * sf)
    n_li = int(6000000 * sf)
    n_ev = int(1000000 * sf)
    n_users = int(15000 * sf)
    n_doc = max(500, int(50000 * sf))
    n_emb = max(500, int(20000 * sf))

    write(out, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    write(out, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    write(out, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust, dtype=np.int64)),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.randint(0, 25, n_cust).astype(np.int32)),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": pa.array(np.array(SEGMENTS)[rng.randint(0, 5, n_cust)]),
    }))
    write(out, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp, dtype=np.int64)),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.randint(0, 25, n_supp).astype(np.int32)),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    }))
    write(out, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part, dtype=np.int64)),
        "p_name": [f"{ADJ[a]} {NOUN[b]}" for a, b in
                   zip(rng.randint(0, 8, n_part), rng.randint(0, 8, n_part))],
        "p_brand": [f"Brand#{b}" for b in rng.randint(0, 25, n_part)],
        "p_type": pa.array(np.array(TYPES)[rng.randint(0, 6, n_part)]),
        "p_size": pa.array(rng.randint(1, 51, n_part).astype(np.int32)),
        "p_retailprice": 900.0 + (np.arange(n_part) % 1000) / 10.0,
    }))

    odate = rng.randint(ORDER_EPOCH_LO // DAY_MS, ORDER_EPOCH_HI // DAY_MS,
                        n_ord, dtype=np.int64) * DAY_MS
    write(out, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord, dtype=np.int64)),
        "o_custkey": pa.array(rng.randint(0, n_cust, n_ord, dtype=np.int64)),
        "o_orderstatus": pa.array(np.array(STATUS)[rng.randint(0, 3, n_ord)]),
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": pa.array(odate * 1000, pa.timestamp("us")),
        "o_orderpriority": pa.array(np.array(PRIORITY)[rng.randint(0, 5, n_ord)]),
    }))

    # lineitem is by far the largest table (6M*sf rows); above ~sf30 the
    # all-in-RAM build needs >40 GB, so --chunk-rows streams it through a
    # ParquetWriter in slices. NOTE: the chunked RNG stream interleaves
    # per-slice draws and therefore yields DIFFERENT values than the
    # unchunked path — only use it for probe-scale fixtures (sf100+),
    # never to regenerate an existing anchor fixture.
    def lineitem_slice(k):
        sdate = (rng.randint(ORDER_EPOCH_LO // DAY_MS, ORDER_EPOCH_HI // DAY_MS,
                             k, dtype=np.int64)
                 + rng.randint(1, 96, k, dtype=np.int64)) * DAY_MS
        return pa.table({
            "l_orderkey": pa.array(rng.randint(0, n_ord, k, dtype=np.int64)),
            "l_partkey": pa.array(rng.randint(0, n_part, k, dtype=np.int64)),
            "l_suppkey": pa.array(rng.randint(0, n_supp, k, dtype=np.int64)),
            "l_linenumber": pa.array(rng.randint(1, 8, k).astype(np.int32)),
            "l_quantity": rng.randint(1, 51, k).astype(np.float64),
            "l_extendedprice": np.round(rng.uniform(900, 105000, k), 2),
            "l_discount": rng.randint(0, 11, k) / 100.0,
            "l_tax": rng.randint(0, 9, k) / 100.0,
            "l_returnflag": pa.array(np.array(["A", "N", "R"])[rng.randint(0, 3, k)]),
            "l_linestatus": pa.array(np.array(["F", "O"])[rng.randint(0, 2, k)]),
            "l_shipdate": pa.array(sdate * 1000, pa.timestamp("us")),
        })

    if chunk_rows and n_li > chunk_rows:
        writer, done = None, 0
        while done < n_li:
            tbl = lineitem_slice(min(chunk_rows, n_li - done))
            if writer is None:
                writer = pq.ParquetWriter(f"{out}/lineitem.parquet", tbl.schema)
            writer.write_table(tbl)
            done += tbl.num_rows
            print(f"  lineitem chunk: {done}/{n_li}", flush=True)
        writer.close()
        print(f"wrote lineitem: {n_li} rows (chunked)")
    else:
        # original stream order: sdate drawn fully before the columns
        sdate = (rng.randint(ORDER_EPOCH_LO // DAY_MS, ORDER_EPOCH_HI // DAY_MS,
                             n_li, dtype=np.int64)
                 + rng.randint(1, 96, n_li, dtype=np.int64)) * DAY_MS
        write(out, "lineitem", pa.table({
            "l_orderkey": pa.array(rng.randint(0, n_ord, n_li, dtype=np.int64)),
            "l_partkey": pa.array(rng.randint(0, n_part, n_li, dtype=np.int64)),
            "l_suppkey": pa.array(rng.randint(0, n_supp, n_li, dtype=np.int64)),
            "l_linenumber": pa.array(rng.randint(1, 8, n_li).astype(np.int32)),
            "l_quantity": rng.randint(1, 51, n_li).astype(np.float64),
            "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
            "l_discount": rng.randint(0, 11, n_li) / 100.0,
            "l_tax": rng.randint(0, 9, n_li) / 100.0,
            "l_returnflag": pa.array(np.array(["A", "N", "R"])[rng.randint(0, 3, n_li)]),
            "l_linestatus": pa.array(np.array(["F", "O"])[rng.randint(0, 2, n_li)]),
            "l_shipdate": pa.array(sdate * 1000, pa.timestamp("us")),
        }))

    ts = np.sort(EVENT_EPOCH_LO + rng.randint(0, EVENT_SPAN_NS, n_ev, dtype=np.int64))
    write(out, "events", pa.table({
        "event_id": pa.array(np.arange(n_ev, dtype=np.int64)),
        "ts": pa.array(ts // 1000, pa.timestamp("us")),
        "user_id": pa.array(rng.randint(0, n_users, n_ev, dtype=np.int64)),
        "event_type": pa.array(np.array(["view", "click", "purchase", "signup", "error"])[
            rng.randint(0, 5, n_ev)]),
        "value": np.round(rng.exponential(50.0, n_ev), 2),
        "props": [json.dumps({"k": int(k)}) for k in rng.randint(0, 100, n_ev)],
    }))

    langs = np.array(["en", "zh", "es", "fr", "de"])
    lang_p = np.array([0.40, 0.15, 0.15, 0.15, 0.15])
    if vocab_mode == "heaps":
        # Heap's law V = K * N^beta (K=12, beta=0.5) with Zipf s=1.1
        # frequencies: a handful of stop-word-hot types, a long rare
        # tail — document frequency now DECAYS with corpus growth, so
        # uncapped LSH band-collision mass thins out the way it does on
        # a real crawl instead of staying scale-invariant
        n_tokens_est = n_doc * 55
        v_size = max(64, int(12 * n_tokens_est ** 0.5))
        heaps_words = np.array([f"w{i}" for i in range(v_size)])
        zipf_cum = np.cumsum(1.0 / np.arange(1, v_size + 1) ** 1.1)
        zipf_cum /= zipf_cum[-1]

        def draw_words(k):
            return heaps_words[np.searchsorted(zipf_cum, rng.rand(k))]
        print(f"vocab: heaps V={v_size} (est tokens {n_tokens_est})")
    else:
        def draw_words(k):
            return [VOCAB[w] for w in rng.randint(0, 31, k)]
    texts, doc_lang, doc_src = [], [], []
    for i in range(n_doc):
        r = rng.rand()
        if i > 10 and r < 0.0016:            # exact copy, metadata re-rolled
            words = texts[rng.randint(0, i)].split(" ")
        elif i > 10 and r < 0.05:            # near-dup: 1-2 word mutations
            words = texts[rng.randint(0, i)].split(" ")
            for _ in range(rng.randint(1, 3)):
                words[rng.randint(0, len(words))] = draw_words(1)[0]
        else:
            words = list(draw_words(rng.randint(10, 101)))
        texts.append(" ".join(words))
        doc_lang.append(langs[np.searchsorted(lang_p.cumsum(), rng.rand())])
        doc_src.append(f"src{rng.randint(0, 20)}")
    write(out, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc, dtype=np.int64)),
        "text": texts,
        "lang": doc_lang,
        "source": doc_src,
        "n_chars": pa.array(np.array([len(t) for t in texts], dtype=np.int64)),
    }))

    emb = rng.normal(0, 1, (n_emb, 64)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    write(out, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb, dtype=np.int64)),
        "embedding": pa.array(list(emb), pa.list_(pa.float32())),
        "label": pa.array(rng.randint(0, 10, n_emb).astype(np.int32)),
    }))


if __name__ == "__main__":
    sf, out = float(sys.argv[1]), sys.argv[2]
    mode = "fixed"
    chunk = 0
    rest = sys.argv[3:]
    for i, a in enumerate(rest):
        if a == "--vocab" and i + 1 < len(rest):
            mode = rest[i + 1]
        elif a.startswith("--vocab="):
            mode = a.split("=", 1)[1]
        elif a == "--chunk-rows" and i + 1 < len(rest):
            chunk = int(rest[i + 1])
        elif a.startswith("--chunk-rows="):
            chunk = int(a.split("=", 1)[1])
    import os
    os.makedirs(out, exist_ok=True)
    gen(sf, out, vocab_mode=mode, chunk_rows=chunk)
