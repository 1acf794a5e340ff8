"""`python -m fastlanes_tpu` — FLT compression CLI (see cli.py)."""

import sys

from .cli import main

sys.exit(main())
