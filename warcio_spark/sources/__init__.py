from .pages import synth_pages  # noqa: F401
from .warc import pages_from_records, read_warc  # noqa: F401
