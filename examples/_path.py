"""Shared sys.path bootstrap for running example scripts directly.

`python examples/foo.py` puts examples/ (the script dir) on sys.path, not
the repo root, so `import sunray_tpu` needs the root appended. APPEND (not
insert-at-0) so repo-root modules can never shadow installed packages.
"""

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.append(_ROOT)
