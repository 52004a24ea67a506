"""Sources: readers and deterministic fixture synthesis.

Reference analog: source drivers (modules/affile/file-reader.c,
modules/afsocket/*, modules/examples/sources/msg-generator). In a
batch Spark engine a "source" is a DataFrame scan; the synthetic
transcript generator stands in for the reference's msg-generator.
"""

from axosyslog_spark.sources.transcripts import (  # noqa: F401
    TRANSCRIPTS_ORACLE_CTE,
    generate_transcripts,
    synthesize_transcripts,
)
