"""adam_spark — a PySpark-native genomics analytics engine.

A brand-new DataFrame-first engine with the query/data-processing
capabilities of bigdatagenomics/adam (see SURVEY.md). Records are plain
Spark SQL rows with fixed StructType schemas (mirroring the bdg-formats
Avro field inventory); genomic metadata travels as JSON sidecars on a
thin :class:`GenomicFrame` wrapper; every operator is a DataFrame
transformation optimized by Catalyst.
"""

from adam_spark.core.genomic_frame import GenomicBroadcast, GenomicFrame
from adam_spark.core.metadata import (
    GenomicMetadata,
    ProcessingStep,
    ReadGroup,
    Reference,
    Sample,
    SequenceDictionary,
)
from adam_spark.session import get_spark

__version__ = "0.1.0"

__all__ = [
    "GenomicBroadcast",
    "GenomicFrame",
    "GenomicMetadata",
    "ProcessingStep",
    "ReadGroup",
    "Reference",
    "Sample",
    "SequenceDictionary",
    "get_spark",
    "__version__",
]
