"""Dump the formatted physical plan of any catalog query.

Usage: python tools/explain.py <query_name> [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    from hadoop_data_pipeline_spark import queries_catalog as qc
    from hadoop_data_pipeline_spark.session import get_session

    spark = get_session("explain", master="local[4]", shuffle_partitions=4)
    if name == "--all":
        for n in qc.QUERIES:
            print(f"\n{'=' * 70}\n{n}\n{'=' * 70}")
            qc.QUERIES[n](spark, sf_dir).explain("formatted")
        return
    qc.QUERIES[name](spark, sf_dir).explain("formatted")


if __name__ == "__main__":
    main()
