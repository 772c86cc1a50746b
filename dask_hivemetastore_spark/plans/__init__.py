"""Driver-checkable query registry.

Importing this package registers every implemented query (SURVEY.md §2's
inventory) into :mod:`.registry`. ``__spark_entry__.py`` re-exports the
result as the driver contract.
"""

from . import registry  # noqa: F401

# Import order is load order; each module registers its queries on import.
from . import tpch  # noqa: F401,E402
from . import relational  # noqa: F401,E402
from . import windows  # noqa: F401,E402
from . import events  # noqa: F401,E402
from . import udf_surface  # noqa: F401,E402
from . import llm  # noqa: F401,E402
from .. import streaming  # noqa: F401,E402

QUERIES = registry.QUERIES
ORACLES = registry.ORACLES
