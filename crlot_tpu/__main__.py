"""`python -m crlot_tpu` runs the demo showcase."""

import sys

from .demo import main

sys.exit(main())
