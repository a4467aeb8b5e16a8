from .knn_join import cosine_knn_join  # noqa: F401
from .index import (  # noqa: F401
    build_ann_index,
    build_ivf_index,
    read_ivf_index,
    topk_cosine_ivf_indexed,
    write_ivf_index,
    read_ann_index,
    topk_cosine_indexed,
    write_ann_index,
)
from .topk import topk_cosine, topk_cosine_ivf, topk_cosine_lsh  # noqa: F401
from .quantize import (  # noqa: F401
    dequantize_expr,
    fit_scalar_quantizer,
    quantize_embeddings,
    topk_cosine_quantized,
)
