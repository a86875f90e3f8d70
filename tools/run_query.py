"""Run any registered query by name: results, the DuckDB oracle, or the
physical plan.

Usage:
  python tools/run_query.py q301_time_bars                 # show 20 rows (sf0.01)
  python tools/run_query.py q301_time_bars --sf sf0.1 -n 5
  python tools/run_query.py q301_time_bars --plan          # formatted physical plan
  python tools/run_query.py q301_time_bars --oracle        # run the DuckDB oracle side
  python tools/run_query.py --list [pattern]               # list registered queries
"""

from __future__ import annotations

import argparse
import fnmatch
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("name", nargs="?", help="query name (see --list)")
    ap.add_argument("--sf", default="sf0.01", help="scale-factor dir name under /root/testdata")
    ap.add_argument("-n", "--rows", type=int, default=20)
    ap.add_argument("--plan", action="store_true", help="print the formatted physical plan instead of rows")
    ap.add_argument("--oracle", action="store_true", help="run the DuckDB oracle instead of the Spark query")
    ap.add_argument("--list", dest="list_pat", nargs="?", const="*", default=None, metavar="PATTERN")
    args = ap.parse_args()

    import __spark_entry__ as entry

    qs = entry.queries()
    if args.list_pat is not None:
        for name in qs:
            if fnmatch.fnmatch(name, f"*{args.list_pat.strip('*')}*"):
                print(name)
        return 0
    if not args.name or args.name not in qs:
        print(f"unknown query {args.name!r}; try --list", file=sys.stderr)
        return 2

    sf_dir = args.sf if os.path.isabs(args.sf) else f"/root/testdata/{args.sf}"
    if args.oracle:
        sql = entry.oracle_sql().get(args.name)
        if sql is None:
            print(f"{args.name} is rows-only (no SQL oracle)", file=sys.stderr)
            return 1
        from tools.verify_local import duck_connection

        con = duck_connection(sf_dir)
        print(con.execute(sql).df().head(args.rows).to_string())
        return 0

    from riptable_spark.session import get_spark

    df = qs[args.name](get_spark("run_query"), sf_dir)
    if args.plan:
        df.explain("formatted")
    else:
        df.show(args.rows, truncate=120)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
