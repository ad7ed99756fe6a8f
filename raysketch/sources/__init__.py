from .tables import read_table
from .transcripts import gen_transcripts, text_for_rows, transcripts_path, write_transcripts

__all__ = ["gen_transcripts", "write_transcripts", "transcripts_path", "text_for_rows", "read_table"]
