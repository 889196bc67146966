"""``python -m lightcurvesclassifier_spark`` → the ``lcc`` CLI."""

import sys

from .cli.lcc import main

if __name__ == "__main__":
    sys.exit(main())
