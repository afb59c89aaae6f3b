from animal2vec_tpu.data.wavio import read_wav, write_wav, wav_info
from animal2vec_tpu.data.labels import read_label_file, write_label_file, audio_path_to_label_path
from animal2vec_tpu.data.manifest import read_manifest, write_manifest
from animal2vec_tpu.data.dataset import AudioLabelDataset, BatchLoader
