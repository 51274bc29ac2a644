"""``python -m adam_spark`` entry point (reference: ADAMMain)."""

import sys

from adam_spark.cli import main

sys.exit(main())
