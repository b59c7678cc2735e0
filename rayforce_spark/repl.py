"""Interactive Rayfall REPL — the reference's ``app/repl.c`` analog,
mapped onto the Python host (SURVEY §2.9: Python IS the application
layer here, so the REPL is a thin readline loop over one
:class:`~rayforce_spark.rayfall.Interp` instead of a C line editor).

Run: ``python -m rayforce_spark.repl [--sf-dir /root/testdata/sf0.01]``
— with ``--sf-dir`` the parquet tables are pre-bound by name (region,
nation, …), so ``(select {n: (count *) from: lineitem})`` works
immediately. Multi-line input: a line with unbalanced parens continues
on the next prompt, like the reference REPL. ``\\q`` or EOF exits.

The same engine is reachable remotely via the IPC server
(``rayforce_spark.ipc.RayfallServer`` — the ``rayforce -p 5110``
analog); this module is the local console.
"""

from __future__ import annotations

import argparse
import sys


def _balanced(s: str) -> bool:
    """True when every ( [ { and string is closed — the continue-prompt
    test. A quote is escaped only under an ODD run of backslashes
    (``"a\\\\"`` IS closed); brackets/braces count like parens so
    multi-line vector and dict literals continue instead of erroring."""
    depth, in_str = 0, False
    for i, c in enumerate(s):
        if in_str:
            if c == '"':
                bs = 0
                while i - 1 - bs >= 0 and s[i - 1 - bs] == "\\":
                    bs += 1
                if bs % 2 == 0:
                    in_str = False
        elif c == '"':
            in_str = True
        elif c in "([{":
            depth += 1
        elif c in ")]}":
            depth -= 1
    return depth <= 0 and not in_str


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--sf-dir", default=None,
                    help="parquet dir whose tables get pre-bound by name")
    ap.add_argument("-q", "--quiet", action="store_true",
                    help="suppress the banner (script/pipe use)")
    args = ap.parse_args(argv)

    from rayforce_spark.rayfall import Interp, RayfallError
    from rayforce_spark.session import get_spark, load_tables

    spark = get_spark("rayforce_spark_repl")
    env = {}
    if args.sf_dir:
        env.update(load_tables(spark, args.sf_dir))
    it = Interp(spark, env)

    if not args.quiet:
        print("rayforce_spark REPL — Rayfall on PySpark "
              f"({spark.version}); \\q to quit")
        if args.sf_dir:
            print(f"tables bound from {args.sf_dir}: "
                  f"{', '.join(sorted(env))}")

    try:
        import readline  # noqa: F401 - line editing when a tty
    except ImportError:  # pragma: no cover
        pass

    from pyspark.sql import DataFrame

    buf = ""
    while True:
        try:
            prompt = "" if args.quiet else ("... " if buf else ">>> ")
            line = input(prompt)
        except EOFError:
            print()
            return 0
        except KeyboardInterrupt:
            buf = ""
            print()
            continue
        if not buf and line.strip() in ("\\q", "\\\\", "exit", "quit"):
            return 0
        buf = f"{buf}\n{line}" if buf else line
        if not buf.strip() or not _balanced(buf):
            continue
        src, buf = buf, ""
        try:
            v = it.eval_str(src)
            if isinstance(v, DataFrame):
                v.show(20, truncate=False)
            elif v is not None:
                print(v)
        except RayfallError as e:
            print(f"error: {e}", file=sys.stderr)
        except Exception as e:  # noqa: BLE001 - REPLs don't die
            print(f"{type(e).__name__}: {e}", file=sys.stderr)


if __name__ == "__main__":
    sys.exit(main())
