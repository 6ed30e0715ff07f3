"""Interactive shell — entry point A of the reference
(shell/impala_shell.py:181, Beeswax client). Here the client and server are
one process: statements go straight into Engine.sql.

Run: ``python -m minimised_impala_spark.shell [--sf-dir DIR]``
Meta-commands: ``help``, ``tables``, ``explain <sql>``, ``profile <sql>``
(runs the query and prints the per-operator runtime profile, the
reference shell's `profile;` analogue), ``quit``.

Ctrl-C during a running statement cancels it and keeps the session —
the reference shell's cancellation path (shell/impala_shell.py:404
handles SIGINT by issuing cancel_query against the in-flight handle);
here it maps to Engine.sql_async + QueryHandle.cancel (job-group
cancellation fanned out to every executor).
"""

from __future__ import annotations

import argparse
import sys

from minimised_impala_spark.engine import Engine


def _render_rows(rows, out, limit: int = 100) -> None:
    """Aligned text table of collected Rows (the shell's result grid)."""
    if not rows:
        out.write("(0 rows)\n")
        return
    cols = list(rows[0].asDict().keys())
    cells = [[str(v) for v in r] for r in rows[:limit]]
    widths = [
        max(len(c), *(len(row[i]) for row in cells)) for i, c in enumerate(cols)
    ]
    line = "+" + "+".join("-" * (w + 2) for w in widths) + "+\n"
    out.write(line)
    out.write(
        "|" + "|".join(f" {c.ljust(w)} " for c, w in zip(cols, widths)) + "|\n"
    )
    out.write(line)
    for row in cells:
        out.write(
            "|" + "|".join(f" {v.ljust(w)} " for v, w in zip(row, widths)) + "|\n"
        )
    out.write(line)
    if len(rows) > limit:
        out.write(f"(showing {limit} of {len(rows)} rows)\n")


def _run_statement(engine: Engine, stmt: str, out) -> None:
    """Execute via the async handle so Ctrl-C cancels the in-flight query
    instead of killing the shell (reference: shell/impala_shell.py:404)."""
    handle = engine.sql_async(stmt)
    try:
        while True:
            try:
                rows = handle.result(timeout=0.2)
                break
            except TimeoutError:
                continue
        _render_rows(rows, out)
    except KeyboardInterrupt:
        handle.cancel()
        out.write("Cancelling query...\nCancelled\n")
    except Exception as e:  # surface, keep the REPL alive
        out.write(f"ERROR: {e}\n")


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
                _run_statement(engine, stmt, out)
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
