from llamatpu.tokenizer.vocabulary import Vocabulary
from llamatpu.tokenizer.builders import build_tokenizer
from llamatpu.tokenizer.bpe import BPETokenizer
from llamatpu.tokenizer.spm import SPMTokenizer
from llamatpu.tokenizer.stream import StreamDecoder

__all__ = ["Vocabulary", "build_tokenizer", "BPETokenizer", "SPMTokenizer", "StreamDecoder"]
