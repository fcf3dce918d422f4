#!/usr/bin/env python3
"""Local wholesale correctness gate — the builder-side mirror of the
driver's DuckDB compare (CORRECTNESS_r{N}.json).

Usage:
  python3 tools/gate.py SF_DIR OUT_DIR [q_a,q_b,...]

Expects graft.Verify to have already written OUT_DIR/<name>/ parquet
dirs plus OUT_DIR/oracle_sql.json (tools/run_gate.sh does both steps).

Compare semantics (mirrors the driver): per query
  - rows:   spark row count == oracle row count
  - schema: sorted column-name sets equal
  - hash:   md5 over the row set with columns sorted by name and rows
            sorted by their stringified tuple; floats rendered via
            repr(round(x, 9)) so engine-identical doubles compare equal
            and the last-ulp class surfaces loudly rather than flaking.

Rendering canonicalization (kills the two historical local-gate false
positives that PERF.md used to carry as "documented rendering FPs"):
  - q_date_funcs class: a tz-naive midnight TIMESTAMP and a DATE are
    the same value — DuckDB casts some date arithmetic to timestamp
    where Spark keeps DATE; both render as the date.
  - q_mixture_sample class: DECIMAL trailing zeros ('0.10' vs '0.1')
    render via normalize() so scale differences don't flake.
The driver's own hash compare already treated both as equal — this
gate now matches it, so local boards read N/N with no FP allowance.
"""
import sys, os, json, glob, hashlib
import datetime
import decimal
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))  # 1.0 renders like BIGINT 1 / DECIMAL 1.00
        return repr(round(v, 9))
    if isinstance(v, decimal.Decimal):
        # integral decimals render as exact ints (a DECIMAL(38,0) sum
        # must not round through float); fractional ones render through
        # the SAME float path as Spark's doubles so 0.80 == 0.8
        if v == v.to_integral_value():
            return str(int(v))
        return repr(round(float(v), 9))
    if isinstance(v, datetime.datetime):
        if v.tzinfo is None and (v.hour, v.minute, v.second, v.microsecond) == (0, 0, 0, 0):
            return v.date().isoformat()
        return v.isoformat(sep=" ")
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.md5()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    subset = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    oracle_sql = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):  # Spark-written table (e.g. ScaleUp's sf1)
            # recursive: a partitioned/nested layout (dir/k=v/*.parquet)
            # must not silently create no view — every query on the
            # table would then read as "missing" instead of erroring
            nested = glob.glob(os.path.join(p, "**", "*.parquet"),
                               recursive=True)
            if not nested:
                print(f"  ! table dir {p} exists but contains no parquet "
                      f"files — view not created", file=sys.stderr)
                continue
            p = os.path.join(p, "**", "*.parquet")
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet("
                        f"'{p}', hive_partitioning = true)")
        elif os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    results, n_ok, n_bad = {}, 0, 0
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        if subset and name not in subset:
            continue
        entry = {}
        try:
            files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
            rel = con.execute(
                "SELECT * FROM read_parquet(?)", [files]).fetchall()
            scols = [d[0] for d in con.description]
            entry["spark_rows"] = len(rel)
            if name not in oracle_sql:
                entry["err"] = "no_oracle"
                results[name] = entry
                continue
            orc = con.execute(oracle_sql[name])
            orows = orc.fetchall()
            ocols = [d[0] for d in orc.description]
            entry["oracle_rows"] = len(orows)
            entry["rows_match"] = len(rel) == len(orows)
            entry["schema_match"] = sorted(scols) == sorted(ocols)
            entry["hash_match"] = (entry["schema_match"] and
                                   table_hash(scols, rel) == table_hash(ocols, orows))
            if not entry["schema_match"]:
                entry["spark_cols"], entry["oracle_cols"] = sorted(scols), sorted(ocols)
        except Exception as e:
            entry["err"] = f"{type(e).__name__}: {e}"[:300]
        results[name] = entry
        ok = entry.get("rows_match") and entry.get("schema_match") \
            and entry.get("hash_match")
        if entry.get("err") == "no_oracle":
            print(f"  ~ {name}: rows-only ({entry['spark_rows']} rows)")
        elif ok:
            n_ok += 1
        else:
            n_bad += 1
            print(f"  ✗ {name}: {entry}")
    print(f"gate: {n_ok} OK, {n_bad} BAD, "
          f"{sum(1 for e in results.values() if e.get('err') == 'no_oracle')} rows-only")
    json.dump(results, open(os.path.join(out_dir, "gate_results.json"), "w"),
              indent=1, default=str)
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
