#!/usr/bin/env python3
"""Deterministic synthetic-testdata generator for scale runs above the
driver-provided SFs.

The driver ships read-only sf0.001/0.01/0.1 (TESTDATA.md, seed=42); the
round-8 brief asks for a 10x-the-bench-SF measurement. This script
regenerates the same star schema with the SAME schemas, key ranges,
value distributions, and planted duplicate structure (measured off
sf0.1 — see row-count formulas inline), scaled by an arbitrary sf.
It is driver-side tooling (numpy/pyarrow), NOT part of the engine.

Usage: python3 tools/gen_sf.py <sf> <outDir>     e.g. 1 data/sf1
"""
import sys, numpy as np, pyarrow as pa, pyarrow.parquet as pq

sf = float(sys.argv[1]); out = sys.argv[2]
import os; os.makedirs(out, exist_ok=True)
rng = np.random.default_rng(42)

REGIONS = ['AFRICA', 'AMERICA', 'ASIA', 'EUROPE', 'MIDDLE EAST']
SEGMENTS = ['AUTOMOBILE', 'BUILDING', 'FURNITURE', 'HOUSEHOLD', 'MACHINERY']
PRIORITIES = ['1-URGENT', '2-HIGH', '3-MEDIUM', '4-NOT SPECIFIED', '5-LOW']
PNAMES = [f'{a} {n}' for a in ['blue','cold','hot','large','new','old','red','small']
          for n in ['anvil','bolt','gear','gizmo','plate','ring','rod','widget']]
BRANDS = [f'Brand#{i}' for i in range(1, 26)]
PTYPES = ['ECONOMY', 'LARGE', 'MEDIUM', 'PROMO', 'SMALL', 'STANDARD']
VOCAB = np.array(['a','agg','batch','big','column','customer','data','dup','fast',
         'filter','group','hash','join','key','line','merge','order','part',
         'query','row','scan','slow','small','sort','spark','stream','table',
         'the','value','vector','window'])
LANGS, LANGP = ['en','zh','es','fr','de'], [0.412, 0.150, 0.149, 0.148, 0.141]

# row counts: formulas fitted to the driver's three SFs
n_cust = int(1_500_000 * sf / 10)      # 150/1500/15000
n_supp = int(100_000 * sf / 10)
n_part = int(2_000_000 * sf / 10)
n_ord  = int(15_000_000 * sf / 10)
n_li   = int(60_000_000 * sf / 10)
n_ev   = int(1_000_000 * sf)
n_user = max(1, n_cust // 10)          # events user_id range = customers/10
n_doc  = max(500, int(50_000 * sf))
n_emb  = max(500, int(20_000 * sf))

DAY = 86_400_000_000  # us per day
def day_ts(lo_day, n_days, size):
    """uniform whole-day TIMESTAMP (us) in [lo, lo+n_days)"""
    return (lo_day + rng.integers(0, n_days, size)) * DAY

EPOCH_1995 = 9131          # days 1970-01-01 -> 1995-01-01
ORD_DAYS = 2404            # 1995-01-01 .. 2001-08-01
SHIP_LO, SHIP_DAYS = EPOCH_1995 + 1, 2498   # +1d .. order max + ~95d

def write(name, cols):
    t = pa.table(cols)
    pq.write_table(t, f'{out}/{name}.parquet', compression='snappy')
    print(f'{name:12s} {t.num_rows:>10,d} rows  {os.path.getsize(f"{out}/{name}.parquet")/1e6:8.1f} MB')

write('region', {'r_regionkey': pa.array(range(5), pa.int32()), 'r_name': REGIONS})
write('nation', {'n_nationkey': pa.array(range(25), pa.int32()),
                 'n_name': [f'NATION_{i}' for i in range(25)],
                 'n_regionkey': pa.array([i % 5 for i in range(25)], pa.int32())})

write('customer', {
    'c_custkey': np.arange(n_cust, dtype=np.int64),
    'c_name': [f'Customer#{i:09d}' for i in range(n_cust)],
    'c_nationkey': rng.integers(0, 25, n_cust, dtype=np.int32),
    'c_acctbal': np.round(rng.uniform(-999.99, 9999.99, n_cust), 2),
    'c_mktsegment': np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]})

write('supplier', {
    's_suppkey': np.arange(n_supp, dtype=np.int64),
    's_name': [f'Supplier#{i:09d}' for i in range(n_supp)],
    's_nationkey': rng.integers(0, 25, n_supp, dtype=np.int32),
    's_acctbal': np.round(rng.uniform(-999.99, 9999.99, n_supp), 2)})

pk = np.arange(n_part, dtype=np.int64)
write('part', {
    'p_partkey': pk,
    'p_name': np.array(PNAMES)[rng.integers(0, 64, n_part)],
    'p_brand': np.array(BRANDS)[rng.integers(0, 25, n_part)],
    'p_type': np.array(PTYPES)[rng.integers(0, 6, n_part)],
    'p_size': rng.integers(1, 51, n_part, dtype=np.int32),
    'p_retailprice': 900.0 + (pk % 1000) / 10.0})

write('orders', {
    'o_orderkey': np.arange(n_ord, dtype=np.int64),
    'o_custkey': rng.integers(0, n_cust, n_ord, dtype=np.int64),
    'o_orderstatus': np.array(['O', 'P', 'F'])[rng.integers(0, 3, n_ord)],
    'o_totalprice': np.round(rng.uniform(1000, 500000, n_ord), 2),
    'o_orderdate': pa.array(day_ts(EPOCH_1995, ORD_DAYS, n_ord), pa.timestamp('us')),
    'o_orderpriority': np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]})

write('lineitem', {
    'l_orderkey': rng.integers(0, n_ord, n_li, dtype=np.int64),
    'l_partkey': rng.integers(0, n_part, n_li, dtype=np.int64),
    'l_suppkey': rng.integers(0, n_supp, n_li, dtype=np.int64),
    'l_linenumber': rng.integers(1, 8, n_li, dtype=np.int32),
    'l_quantity': rng.integers(1, 51, n_li).astype(np.float64),
    'l_extendedprice': np.round(rng.uniform(900, 105000, n_li), 2),
    'l_discount': rng.integers(0, 11, n_li) / 100.0,
    'l_tax': rng.integers(0, 9, n_li) / 100.0,
    'l_returnflag': np.array(['A', 'N', 'R'])[rng.integers(0, 3, n_li)],
    'l_linestatus': np.array(['F', 'O'])[rng.integers(0, 2, n_li)],
    'l_shipdate': pa.array(day_ts(SHIP_LO, SHIP_DAYS, n_li), pa.timestamp('us'))})

# events: timestamps sorted over one month (event_id follows arrival order)
ev_ts = np.sort(rng.integers(0, 30 * DAY, n_ev)) + 19723 * DAY  # 2024-01-01
write('events', {
    'event_id': np.arange(n_ev, dtype=np.int64),
    'ts': pa.array(ev_ts, pa.timestamp('us')),
    'user_id': rng.integers(0, n_user, n_ev, dtype=np.int64),
    'event_type': np.array(['view','click','purchase','signup','error'])[rng.integers(0, 5, n_ev)],
    'value': np.round(rng.exponential(50.0, n_ev), 2),
    'props': [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)]})

# documents: 10..100 uniform-vocab words; planted duplicate structure as
# measured at sf0.1 — ~4.6% of docs are a near-copy of an earlier doc
# with the last word dropped, ~0.32% are exact copies
texts = []
for i in range(n_doc):
    u = rng.random()
    if i > 0 and u < 0.0466:
        src = texts[rng.integers(0, i)]
        texts.append(src.rsplit(' ', 1)[0])
    elif i > 0 and u < 0.0498:
        texts.append(texts[rng.integers(0, i)])
    else:
        nw = rng.integers(10, 101)
        texts.append(' '.join(VOCAB[rng.integers(0, len(VOCAB), nw)]))
write('documents', {
    'doc_id': np.arange(n_doc, dtype=np.int64),
    'text': texts,
    'lang': np.array(LANGS)[rng.choice(5, n_doc, p=LANGP)],
    'source': np.array([f'src{i}' for i in range(20)])[rng.integers(0, 20, n_doc)],
    'n_chars': np.array([len(t) for t in texts], dtype=np.int64)})

# embeddings: 64-dim unit vectors (no strong cluster structure at sf0.1:
# measured label-centroid norms ~= sampling noise); ~0.6% near-dup pairs
# so the cosine-pair/canonical queries exercise a non-empty pair stream
E = rng.standard_normal((n_emb, 64)).astype(np.float32)
ndup = max(3, int(0.006 * n_emb))
dup_dst = rng.integers(n_emb // 2, n_emb, ndup)
dup_src = rng.integers(0, n_emb // 2, ndup)
E[dup_dst] = E[dup_src] + rng.standard_normal((ndup, 64)).astype(np.float32) * 0.02
E /= np.linalg.norm(E, axis=1, keepdims=True)
write('embeddings', {
    'vec_id': np.arange(n_emb, dtype=np.int64),
    'embedding': pa.array(list(E), pa.list_(pa.float32())),
    'label': rng.integers(0, 10, n_emb, dtype=np.int32)})
print('done:', out)
