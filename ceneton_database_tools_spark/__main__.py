"""``python -m ceneton_database_tools_spark`` → the ``ct-db`` CLI.

Reference parity: ``/root/reference/src/ceneton_database_utils/__main__.py``
dispatches to its click CLI the same way.
"""

import sys

from ceneton_database_tools_spark.cli import main

if __name__ == "__main__":
    sys.exit(main())
