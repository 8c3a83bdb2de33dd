"""``python -m pqa2_tpu`` — GUI when PyQt5 exists and no args are given,
otherwise the CLI."""

import sys

if len(sys.argv) > 1:
    from pqa2_tpu.cli import main

    sys.exit(main())
else:
    from pqa2_tpu.main import main

    sys.exit(main())
