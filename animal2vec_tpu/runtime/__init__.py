from animal2vec_tpu.runtime.native import (
    available as native_available,
    decode_batch,
    ensure_built,
    wav_info_native,
)
