"""`python -m amatsukaze_tpu.server` — headless server host (see cli.py)."""

from .cli import main

raise SystemExit(main())
