"""Pure-Python/numpy extraction kernels.

These are the engine's "expression library" — the analogue of the reference's
geometry/scalar kernels (/root/reference/deepdoctection/datapoint/box.py,
pipe/order.py, pipe/segment.py, pipe/refine.py) re-targeted from pixel
bounding boxes to character-offset spans. They are deliberately free of any
Spark import so that:

1. the pandas-UDF operators call them per Arrow batch (vectorized transport,
   zero per-row Python at the Spark level), and
2. the pytest golden oracle calls the *same* kernels on frozen fixtures,
   mirroring the reference's fixture-driven unit tests
   (/root/reference/tests/pipe/*).
"""

from deepdoctection_spark.kernels.extract import extract_turn, finalize_turn  # noqa: F401
from deepdoctection_spark.kernels.ids import span_id  # noqa: F401
