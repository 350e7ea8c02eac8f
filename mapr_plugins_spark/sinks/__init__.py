from mapr_plugins_spark.sinks.document import (
    DOC_SINK_SUPPORTED_TYPES,
    encode_documents,
    validate_doc_schema,
    write_document_table,
)

__all__ = [
    "encode_documents",
    "write_document_table",
    "validate_doc_schema",
    "DOC_SINK_SUPPORTED_TYPES",
]
