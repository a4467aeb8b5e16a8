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
    build_ivfpq_index,
    dequantize_expr,
    encode_pq,
    fit_product_quantizer,
    fit_scalar_quantizer,
    quantize_embeddings,
    read_ivfpq_index,
    topk_cosine_ivfpq,
    topk_cosine_pq,
    topk_cosine_quantized,
    write_ivfpq_index,
)
