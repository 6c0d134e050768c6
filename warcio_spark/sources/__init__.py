from .cdxj import read_cdx11, read_cdxj  # noqa: F401
from .pages import synth_pages  # noqa: F401
from .warc import (  # noqa: F401
    pages_from_records,
    read_warc,
    read_warc_entries,
)
