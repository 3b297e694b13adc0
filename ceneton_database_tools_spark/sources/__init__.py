"""Input sources: FMP-XML DataSource, txn-table streaming source,
path/compression resolution."""

from ceneton_database_tools_spark.sources.txn_stream import (  # noqa: F401
    TxnTableDataSource,
    register_txn_source,
)
from ceneton_database_tools_spark.sources.fmp_xml import (  # noqa: F401
    FMPXMLDataSource,
    parse_fmp_header,
    read_fmp_xml_df,
    register_fmp_source,
)
from ceneton_database_tools_spark.sources.paths import (  # noqa: F401
    open_xml_stream,
    resolve_input_path,
)
