from .registry import QUERIES, QuerySpec, oracle_sql_map, query_map  # noqa: F401
from . import parity  # noqa: F401  (registers on import)
from . import ext  # noqa: F401
from . import streaming_q  # noqa: F401
from . import seqfile_q  # noqa: F401
from . import tpch  # noqa: F401
from . import curation  # noqa: F401
from . import sources  # noqa: F401
from . import stats  # noqa: F401
from . import features  # noqa: F401
