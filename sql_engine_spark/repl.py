"""Interactive REPL, like the reference's rustyline loop
(/root/reference/src/main.rs:12-37): read a line, execute, print the
rounded table or "<Stage> Error: <msg>"."""

from __future__ import annotations

import logging
import sys

from sql_engine_spark.engine import Engine
from sql_engine_spark.errors import EngineError


def main() -> None:
    engine = Engine()
    # Spark's loggers (JVM log4j + PySpark's structured Python logger)
    # dump JSON stacktraces on every failed query; the REPL surface shows
    # only the taxonomy message (types/error.rs style).
    engine.spark.sparkContext.setLogLevel("OFF")
    logging.getLogger("SQLQueryContextLogger").setLevel(logging.CRITICAL)
    print(f"sql-engine-spark (Spark {engine.spark.version}) — \\q to quit")
    while True:
        try:
            line = input("> ")
        except (EOFError, KeyboardInterrupt):
            break
        line = line.strip()
        if not line:
            continue
        if line in {"\\q", "quit", "exit"}:
            break
        try:
            print(engine.execute(line, max_rows=200))
        except EngineError as err:
            print(err)
    engine.spark.stop()


if __name__ == "__main__":
    sys.exit(main())
