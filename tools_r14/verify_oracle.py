import sys; sys.path.insert(0, "/root/repo")
import importlib, duckdb, math
mod = importlib.import_module("__spark_entry__")
from nlp_with_pyspark_spark.session import get_spark
spark = get_spark(shuffle_partitions=8)
rows = mod.entry(spark).collect()
print("SMOKE entry rows:", len(rows))
qs, osql = mod.queries(), mod.oracle_sql()
sf = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
def canon(pdf):
    cols = sorted(pdf.columns)
    def cv(v):
        if v is None: return "NULL"
        if isinstance(v, float): return "NaN" if math.isnan(v) else f"{v:.12g}"
        return str(v)
    return sorted(tuple(cv(v) for v in r) for r in pdf[cols].itertuples(index=False))
names = sorted(qs) if len(sys.argv) < 2 else sys.argv[1:]
bad = []
for name in names:
    spdf = qs[name](spark, sf).toPandas()
    if name in osql:
        opdf = con.execute(osql[name]).fetchdf()
        ok = canon(spdf) == canon(opdf)
        print(f"ORACLE {name}: rows={len(spdf)}/{len(opdf)} match={ok}")
        if not ok: bad.append(name)
    else:
        print(f"ROWSONLY {name}: rows={len(spdf)}")
print("RESULT:", "PASS" if not bad else f"FAIL {bad}")
