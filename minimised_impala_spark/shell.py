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


def substitute_vars(text: str, variables: dict[str, str]) -> str:
    r"""Reference-shell variable substitution (shell/impala_shell.py:426
    _replace_variables): ``${VAR:name}`` placeholders resolve from
    ``--var name=value`` definitions, case-insensitively on the name;
    an unknown variable is an error, and ``\${...}`` escapes."""
    import re as _re

    lowered = {k.lower(): v for k, v in variables.items()}

    def repl(m: _re.Match) -> str:
        name = m.group(1)
        if name.lower() not in lowered:
            raise KeyError(f"unknown variable {name!r}; define with --var")
        return lowered[name.lower()]

    return _re.sub(r"(?<!\\)\$\{[Vv][Aa][Rr]:([^}]+)\}", repl, text)


def _split_statements(text: str) -> list[str]:
    """Split a script on ';' terminators (the reference shell's batch
    splitter, shell/impala_shell.py execute_queries; comments and strings
    containing ';' are out of scope here as they were there)."""
    return [s.strip() for s in text.split(";") if s.strip()]


def run_batch(
    engine: Engine,
    statements: list[str],
    out,
    delimited: bool = False,
    delimiter: str = "\t",
) -> int:
    """Non-interactive execution (the reference's ``-q``/``-f`` modes,
    shell/impala_shell.py option parsing): run each statement, render
    results as the grid or, with ``delimited`` (the reference's ``-B
    --output_delimiter``), as machine-readable delimited rows without
    headers. Returns a process exit code (first failure wins, remaining
    statements still run — matching ``--ignore_query_failure=false``
    semantics loosely enough for scripting)."""
    code = 0
    for stmt in statements:
        try:
            rows = engine.sql(stmt).collect()
        except Exception as e:  # report and continue, nonzero exit
            out.write(f"ERROR: {e}\n")
            code = 1
            continue
        if delimited:
            for r in rows:
                out.write(
                    delimiter.join("" if v is None else str(v) for v in r) + "\n"
                )
        else:
            _render_rows(rows, out)
    return code


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description="minimised-impala-spark shell")
    p.add_argument("--sf-dir", default=None, help="fixture dir to pre-register tables from")
    p.add_argument("--cpus", type=int, default=4)
    p.add_argument("-q", "--query", default=None,
                   help="execute statement(s) and exit (reference -q)")
    p.add_argument("-f", "--query-file", default=None,
                   help="execute statements from a file and exit (reference -f)")
    p.add_argument("-B", "--delimited", action="store_true",
                   help="print rows delimited instead of the grid (reference -B)")
    p.add_argument("--output_delimiter", default="\t",
                   help="field delimiter for -B (reference --output_delimiter)")
    p.add_argument("-o", "--output-file", default=None,
                   help="write results to a file instead of stdout (reference -o)")
    p.add_argument("--var", action="append", default=[], metavar="NAME=VALUE",
                   help="define a substitution variable for ${VAR:name} "
                        "placeholders (reference --var; repeatable)")
    p.add_argument("--serve-beeswax", type=int, default=None, metavar="PORT",
                   help="serve the Beeswax wire protocol on PORT instead of "
                        "running the REPL (the reference's impalad shell port)")
    args = p.parse_args(argv)
    engine = Engine.local(cpus=args.cpus)
    if args.sf_dir:
        engine.load_fixture_tables(args.sf_dir)
    if args.serve_beeswax is not None:
        from minimised_impala_spark.beeswax import BeeswaxServer

        server = BeeswaxServer(engine, port=args.serve_beeswax).start()
        print(f"Beeswax server on port {server.port}; Ctrl-C to stop")
        try:
            import time as _time

            while True:
                _time.sleep(3600)
        except KeyboardInterrupt:
            server.stop()
        return
    script = None
    if args.query is not None:
        script = args.query
    elif args.query_file is not None:
        with open(args.query_file) as fh:
            script = fh.read()
    if script is not None:
        variables = dict(v.split("=", 1) for v in args.var)
        script = substitute_vars(script, variables)
        out = open(args.output_file, "w") if args.output_file else sys.stdout
        try:
            code = run_batch(
                engine,
                _split_statements(script),
                out,
                delimited=args.delimited,
                delimiter=args.output_delimiter,
            )
        finally:
            if args.output_file:
                out.close()
        raise SystemExit(code)
    repl(engine)


if __name__ == "__main__":
    main()
