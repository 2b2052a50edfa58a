"""Shape-bucketing helper shared by every data-dependent pad in the repo.

On the remote TPU platform any op whose input length varies per call
compiles a fresh executable (20-40 s); padding lengths to a coarse
geometric ladder keeps the set of compiled shapes small while the padded
rows cost microseconds (PERFORMANCE.md "platform gotchas").  One helper so
the ladder policy lives in one place:

- ``factor=2`` — fine granularity (≤2× pad waste): chamfer clouds,
  triangle arrays.
- ``factor=4`` — coarse granularity for shapes that take many values per
  run (sphere-march rounds, sparse-grid bands): fewer executables at ≤4×
  waste on the smallest instances.
"""

from __future__ import annotations


def next_bucket(n: int, floor: int, factor: int = 2, cap: int | None = None):
    """Smallest ``floor * factor**k ≥ n``, clamped to ``cap`` if given."""
    b = floor
    while b < n and (cap is None or b < cap):
        b *= factor
    return b if cap is None else min(b, cap)
