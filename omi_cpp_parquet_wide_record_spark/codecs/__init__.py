"""Codec registry: importing this package registers every kernel."""

from omi_cpp_parquet_wide_record_spark.codecs import base  # noqa: F401
from omi_cpp_parquet_wide_record_spark.codecs.plain import PlainCodec  # noqa: F401
from omi_cpp_parquet_wide_record_spark.codecs.intcodecs import (  # noqa: F401
    BitpackCodec, DeltaCodec, ForCodec,
)
from omi_cpp_parquet_wide_record_spark.codecs.dictionary import (  # noqa: F401
    DictCodec, RleCodec,
)
from omi_cpp_parquet_wide_record_spark.codecs.fsst import FsstCodec  # noqa: F401
from omi_cpp_parquet_wide_record_spark.codecs.alp import (  # noqa: F401
    AlpCodec, AlpRdCodec,
)
from omi_cpp_parquet_wide_record_spark.codecs.listarr import ListCodec  # noqa: F401
from omi_cpp_parquet_wide_record_spark.codecs.base import (  # noqa: F401
    Encoded, codec_names, decode_column, encode_column, get_codec, plain_size,
)
