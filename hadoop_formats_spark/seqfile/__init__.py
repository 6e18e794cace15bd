from .core import (  # noqa: F401
    Header,
    RecordBlock,
    SeqFileError,
    SeqFileWriter,
    iter_block_counts,
    iter_blocks,
    parse_header,
    read_file,
    read_header,
    write_table,
)
