"""Large-scale-pipeline extension queries (BASELINE.json north star):
dedup, similarity search, text analysis, multimodal, streaming analytics.

Filled in module-by-module; each extension registers here so the driver's
correctness gate sees it. (Real implementations live in operators/.)
"""

from __future__ import annotations
