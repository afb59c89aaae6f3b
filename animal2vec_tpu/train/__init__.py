from animal2vec_tpu.train.optim import build_optimizer, build_lr_schedule
from animal2vec_tpu.train.state import PretrainState, FinetuneState
