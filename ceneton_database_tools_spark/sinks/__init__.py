"""Output sinks: JSONL writer + SQL database sink with metadata table."""

from ceneton_database_tools_spark.sinks.jsonl import (  # noqa: F401
    iter_jsonl,
    write_jsonl,
)
from ceneton_database_tools_spark.sinks.parquet import (  # noqa: F401
    read_partitioned,
    write_partitioned,
)
from ceneton_database_tools_spark.sinks.sqldb import (  # noqa: F401
    create_db_from_df,
    generate_ddl,
)
