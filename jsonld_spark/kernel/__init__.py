"""Pure-Python JSON-LD 1.0 kernels (no Spark dependency).

These mirror the semantics of the reference processor
(/root/reference/Processor.php) so that per-document results are
identical; the Spark layer distributes them as Arrow-batched UDFs.
"""

from jsonld_spark.kernel.api import (  # noqa: F401
    expand,
    flatten,
    to_rdf,
    to_rdf_quads,
    compact,
    from_rdf,
    frame,
)
from jsonld_spark.kernel.nquads import nquads_serialize, nquads_parse  # noqa: F401
from jsonld_spark.kernel.exceptions import JsonLdError  # noqa: F401
