from .tokenizers import (
    CHAR_UNITS,
    TIMIT_PHONE61,
    CharTokenizer,
    PhoneTokenizer,
    Tokenizer,
    WordTokenizer,
    build_tokenizer,
    fold_phones,
    load_unit_file,
    phone_inventory,
)
from .frame_ops import splice_frames, stack_frames
from .toy_corpus import ToyCorpus, Utterance
from .dataset import Dataset, bucket_ladder, pad_to_ladder

__all__ = [
    "CHAR_UNITS",
    "TIMIT_PHONE61",
    "CharTokenizer",
    "Dataset",
    "PhoneTokenizer",
    "Tokenizer",
    "ToyCorpus",
    "Utterance",
    "WordTokenizer",
    "bucket_ladder",
    "build_tokenizer",
    "fold_phones",
    "load_unit_file",
    "pad_to_ladder",
    "phone_inventory",
    "splice_frames",
    "stack_frames",
]
