from .formats import (  # noqa: F401
    CONVERTERS,
    detect_format,
    read_auto,
    sniff_delimiter,
    stata_to_csv,
    tsv_to_csv,
)
from .writers import CsvWriter, D3mWriter, PandasWriter, get_writer  # noqa: F401
