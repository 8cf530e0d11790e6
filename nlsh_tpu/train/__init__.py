"""Training layer: jitted trainer harness + the learner families."""

from nlsh_tpu.train.base import Trainer, TrainState  # noqa: F401
from nlsh_tpu.train.triplet import TripletTrainer, triplet_loss  # noqa: F401
from nlsh_tpu.train.siamese import SiameseTrainer, contrastive_loss  # noqa: F401
from nlsh_tpu.train.proposed import ProposedTrainer  # noqa: F401
from nlsh_tpu.train.ae import AETrainer  # noqa: F401
from nlsh_tpu.train.vqvae import VQVAETrainer  # noqa: F401
from nlsh_tpu.train.hnsw import HNSWBaseline  # noqa: F401
from nlsh_tpu.train.multitable import MultiTableTrainer  # noqa: F401

# reference-compatible aliases (nlsh/trainers/__init__.py:1-13)
AE = AETrainer
VQVAE = VQVAETrainer
HierarchicalNavigableSmallWorldGraph = HNSWBaseline
