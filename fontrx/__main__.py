"""``python -m fontrx`` — the CLI entry point (same as the ``fontrx``
console script; the analog of the reference's single executable,
``src/main.zig:21-61``)."""

import sys

from fontrx.cli.main import main

if __name__ == "__main__":
    sys.exit(main())
