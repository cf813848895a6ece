"""facebook_crawler_spark — a from-scratch PySpark-native analytics engine.

Re-expresses the query and data-processing capabilities of the reference
crawler (tamediadigital/facebook-crawler, read-only at /root/reference) as an
idiomatic Spark engine: a host-partitioned priority URL frontier + politeness
scheduler over image+caption tables, snapshot set-algebra, a scalar-function
library compiled to Catalyst expressions, and large-scale training-data
pipeline operators (dedup, similarity search, text analysis, multimodal).

Nothing here is a port: the reference's sequential Playwright loops
(reference main.py:11-43) become declarative DataFrame plans; its Redis
resume-state (reference db/redis_db.py:8-23) becomes an ACID ledger table;
its proxy politeness (reference config.py:81-103) becomes a per-host
token-bucket budget rank executed as window functions.
"""

__version__ = "0.1.0"

from facebook_crawler_spark.session import get_spark  # noqa: F401
