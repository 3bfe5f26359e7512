"""Scale-factor paths shared by the parity/property suites.

Both SF paths derive from the same env-var base that the ``sf_dir``
fixture honors (SPARK_GRAFT_SMOKE_DIR), so relocated fixtures keep the
parametrized suites working — no absolute literals.
"""

from __future__ import annotations

import os

SF_SMOKE = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")

#: the default suite proves BOTH the smoke SF and the driver's
#: correctness-gate SF (sf0.01) — no env var needed (VERDICT r02 #5).
_BASE = os.path.dirname(SF_SMOKE.rstrip("/")) or "/root/testdata"
BOTH_SFS = [os.path.join(_BASE, "sf0.001"), os.path.join(_BASE, "sf0.01")]
