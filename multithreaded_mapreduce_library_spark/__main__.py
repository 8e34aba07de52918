"""Command-line entry point.

    python -m multithreaded_mapreduce_library_spark list [--tag TAG]
    python -m multithreaded_mapreduce_library_spark run NAME [--sf DIR] [--limit N]
    python -m multithreaded_mapreduce_library_spark explain NAME [--sf DIR]

`list` prints the operator inventory (name, tags, oracle-gated or
rows-only). `run` executes one registered query and prints a result
sample; `explain` prints the formatted physical plan — the .explain
discipline the operators are written against.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="multithreaded_mapreduce_library_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    p_list = sub.add_parser("list", help="print the operator inventory")
    p_list.add_argument("--tag", default=None, help="filter by tag substring")

    for cmd in ("run", "explain"):
        sp = sub.add_parser(cmd)
        sp.add_argument("name")
        sp.add_argument("--sf", default=None, help="fixture dir (default $SPARK_GRAFT_SF_DIR)")
        if cmd == "run":
            sp.add_argument("--limit", type=int, default=20)

    args = p.parse_args(argv)

    from multithreaded_mapreduce_library_spark.registry import load_all

    specs = load_all()

    if args.cmd == "list":
        try:
            for name, spec in specs.items():
                if args.tag and not any(args.tag in t for t in spec.tags):
                    continue
                gate = "oracle" if spec.oracle else "rows-only"
                print(f"{name:28s} [{gate:9s}] {','.join(spec.tags)}")
        except BrokenPipeError:  # `| head` closed the pipe — not an error
            pass
        return 0

    if args.name not in specs:
        print(f"unknown query {args.name!r}; `list` shows the inventory", file=sys.stderr)
        return 2

    from multithreaded_mapreduce_library_spark.session import get_spark
    from multithreaded_mapreduce_library_spark.sources import default_sf_dir

    sf_dir = args.sf or default_sf_dir()
    spark = get_spark(app_name=f"cli-{args.cmd}")
    df = specs[args.name].builder(spark, sf_dir)

    if args.cmd == "explain":
        df.explain("formatted")
    else:
        df.show(args.limit, truncate=40)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
