"""``python -m raweditor_tpu.cli`` entry point."""

import sys

from raweditor_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main())
