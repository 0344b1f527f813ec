#!/usr/bin/env python
"""spark-submit entry point for the CLI.

spark-submit takes a script file (it has no ``-m`` module mode), so this
wrapper is what you hand it; everything after the script name is the
ordinary CLI argv:

    zip -r dbimport_spark.zip dbimport_spark
    spark-submit --py-files dbimport_spark.zip tools/submit_entry.py \\
        replay /lake/table /lake/log --batches 16

Inside a spark-submit-launched driver the session already exists;
``dbimport_spark.session.get_spark`` picks it up via getOrCreate, so the
CLI's ``--master`` flag is simply omitted (the cluster manager decides).
"""

import sys

from dbimport_spark.cli import main

if __name__ == "__main__":
    sys.exit(main())
