"""spark-submit job driver (north rule: "runs via spark-submit
--py-files").

Usage:
    spark-submit --py-files build/cli_spark.zip scripts/run_job.py \
        pipeline --n-files 100000 --workdir /tmp/kg_run

`--py-files` puts cli_spark.zip on the PYTHONPATH of the driver and
every executor, so this file only needs to be a thin argv forwarder
into the package CLI (`cli_spark.__main__.main`), which builds the
SparkSession from the spark-submit-provided conf (master, memory,
etc. come from the submit command line, not from code).
"""

from __future__ import annotations

import sys


def main() -> int:
    from cli_spark.__main__ import main as cli_main

    return cli_main(sys.argv[1:])


if __name__ == "__main__":
    raise SystemExit(main())
