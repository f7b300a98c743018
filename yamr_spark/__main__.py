"""``python -m yamr_spark`` — see yamr_spark/cli.py."""

import sys

from yamr_spark.cli import main

sys.exit(main())
