"""Driver-contract query registry (package form, split round 12).

The monolithic registry.py grew ~700 lines/round (VERDICT r11 #9);
entry definitions now live in per-wave modules and the window
bookkeeping in window.py. REGISTRATION ORDER IS LOAD-BEARING -- the
driver emits CORRECTNESS rows for the first 50 iteration-order
entries -- and is preserved by the import sequence below plus
window._finalize_order() (which reorders to _PROMOTED + middle +
_DEMOTED exactly as before the split).

Public surface (unchanged): SPARK_QUERIES, ORACLES, flagship,
_PROMOTED, _DEMOTED.
"""

from ._core import ORACLES, QueryFn, SPARK_QUERIES, _register  # noqa: F401
from . import entries_engine  # noqa: F401,E402  (order matters)
from . import entries_ranking  # noqa: F401,E402
from . import entries_curation  # noqa: F401,E402
from . import entries_contracts  # noqa: F401,E402
from .window import _DEMOTED, _PROMOTED, flagship  # noqa: F401,E402
