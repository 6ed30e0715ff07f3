"""Interactive shell — entry point A of the reference
(shell/impala_shell.py:181, Beeswax client). Here the client and server are
one process: statements go straight into Engine.sql.

Run: ``python -m minimised_impala_spark.shell [--sf-dir DIR]``
Meta-commands: ``help``, ``tables``, ``explain <sql>``, ``profile <sql>``
(runs the query and prints the per-operator runtime profile, the
reference shell's `profile;` analogue), ``quit``.
"""

from __future__ import annotations

import argparse
import sys

from minimised_impala_spark.engine import Engine


def repl(engine: Engine, in_stream=sys.stdin, out=sys.stdout) -> None:
    buf: list[str] = []
    out.write("engine> ")
    out.flush()
    for line in in_stream:
        stripped = line.strip()
        if not buf and stripped.lower() in ("quit", "exit", "quit;", "exit;"):
            break
        if not buf and stripped.lower() in ("help", "help;"):
            out.write(__doc__ + "\n")
        elif not buf and stripped.lower() in ("tables", "tables;"):
            engine.spark.sql("SHOW TABLES").show(100, truncate=False)
        elif not buf and stripped.lower().startswith("explain "):
            out.write(engine.explain(stripped[len("explain "):].rstrip(";")) + "\n")
        elif not buf and stripped.lower().startswith("profile "):
            try:
                out.write(engine.profile(stripped[len("profile "):].rstrip(";")) + "\n")
            except Exception as e:  # surface, keep the REPL alive
                out.write(f"ERROR: {e}\n")
        else:
            buf.append(line)
            if stripped.endswith(";"):
                stmt = "\n".join(buf).rstrip().rstrip(";")
                buf = []
                try:
                    engine.sql(stmt).show(100, truncate=False)
                except Exception as e:  # surface, keep the REPL alive
                    out.write(f"ERROR: {e}\n")
        if not buf:
            out.write("engine> ")
            out.flush()


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description="minimised-impala-spark shell")
    p.add_argument("--sf-dir", default=None, help="fixture dir to pre-register tables from")
    p.add_argument("--cpus", type=int, default=4)
    args = p.parse_args(argv)
    engine = Engine.local(cpus=args.cpus)
    if args.sf_dir:
        engine.load_fixture_tables(args.sf_dir)
    repl(engine)


if __name__ == "__main__":
    main()
