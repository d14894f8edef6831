from .tables import read_table
from .transcripts import derive_transcripts, synth_transcripts_parquet, TURNS_PER_CONV
from .gazetteer import build_gazetteer, build_aliases, GAZETTEER_TOP_N, STOPWORDS

__all__ = [
    "read_table",
    "derive_transcripts",
    "synth_transcripts_parquet",
    "TURNS_PER_CONV",
    "build_gazetteer",
    "build_aliases",
    "GAZETTEER_TOP_N",
    "STOPWORDS",
]
