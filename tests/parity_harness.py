"""Dev harness: compare a Spark DataFrame against DuckDB SQL on the
testdata tables. Used interactively while developing oracle SQL;
the real gate is tests/test_entry_contract.py."""

import math

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def ddb_con(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def compare(sdf, con, sql, name="q", verbose=True):
    s_cols = [c.lower() for c in sdf.columns]
    s_rows = [tuple(r) for r in sdf.collect()]
    res = con.execute(sql)
    d_cols = [c[0].lower() for c in res.description]
    d_rows = res.fetchall()
    if sorted(s_cols) != sorted(d_cols):
        print(f"[{name}] SCHEMA MISMATCH spark={s_cols} duck={d_cols}")
        return False
    if len(s_rows) != len(d_rows):
        print(f"[{name}] ROWCOUNT MISMATCH spark={len(s_rows)} duck={len(d_rows)}")
        return False
    idx_s = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
    idx_d = sorted(range(len(d_cols)), key=lambda i: d_cols[i])

    def norm(rows, idx):
        out = []
        for r in rows:
            vals = []
            for i in idx:
                v = r[i]
                if isinstance(v, float):
                    v = round(v, 6)
                vals.append(v)
            out.append(tuple(vals))
        return sorted(out, key=lambda t: tuple(str(x) for x in t))

    sn, dn = norm(s_rows, idx_s), norm(d_rows, idx_d)
    for i, (a, b) in enumerate(zip(sn, dn)):
        for x, y in zip(a, b):
            ok = (
                math.isclose(float(x), float(y), rel_tol=1e-6, abs_tol=1e-6)
                if isinstance(x, float) or isinstance(y, float)
                else x == y
            )
            if not ok:
                print(f"[{name}] VALUE MISMATCH at row {i}: {a} vs {b}")
                return False
    if verbose:
        print(f"[{name}] OK ({len(s_rows)} rows)")
    return True
