from newsreclib_tpu.models.fair_rec.manner import (
    MANNeRA,
    evaluate_ensemble,
    MANNeRCR,
    MANNeREnsemble,
    MANNeRNewsEncoder,
    aspect_module_scores,
    manner_ensemble_scores,
    supcon_embedding_loss,
    zscore_per_impression,
)
from newsreclib_tpu.models.fair_rec.senti_debias import (
    SentiDebiasDiscriminator,
    SentiDebiasGenerator,
    SentiDebiasState,
    create_sentidebias_state,
    make_sentidebias_train_step,
)
from newsreclib_tpu.models.fair_rec.sentirec import SentiRec

__all__ = [
    "MANNeRA",
    "MANNeRCR",
    "MANNeREnsemble",
    "MANNeRNewsEncoder",
    "SentiDebiasDiscriminator",
    "SentiDebiasGenerator",
    "SentiDebiasState",
    "SentiRec",
    "aspect_module_scores",
    "evaluate_ensemble",
    "create_sentidebias_state",
    "make_sentidebias_train_step",
    "manner_ensemble_scores",
    "supcon_embedding_loss",
    "zscore_per_impression",
]
