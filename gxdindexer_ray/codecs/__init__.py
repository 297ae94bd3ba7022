from .varint import varint_encode, varint_decode
from .postings import PostingList, encode_postings, decode_postings

__all__ = [
    "varint_encode",
    "varint_decode",
    "PostingList",
    "encode_postings",
    "decode_postings",
]
