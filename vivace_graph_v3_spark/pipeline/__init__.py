from vivace_graph_v3_spark.pipeline.text import (
    with_token_count, with_quality_score, with_lang_id, with_fingerprint)
from vivace_graph_v3_spark.pipeline.dedup import (
    exact_dedup, ngram_jaccard_pairs, minhash_lsh_candidates,
    minhash_dedup_pairs, simhash_signatures, simhash_dup_pairs,
    embedding_dup_pairs)
from vivace_graph_v3_spark.pipeline.similarity import (
    cosine_topk_bruteforce, ivf_ann_topk, ivf_index, ivf_probe,
    lsh_ann_topk, train_centroids)
from vivace_graph_v3_spark.pipeline.multimodal import (
    synthesize_media, synthesize_ppm_media, decode_and_featurize,
    resize_image, frame_sample)
from vivace_graph_v3_spark.pipeline.retrieval import dense_topk, hybrid_rrf
from vivace_graph_v3_spark.pipeline.packing import (
    pack_sequences, packing_stats)
from vivace_graph_v3_spark.pipeline.text import (
    redact_pii, collocations_pmi, dataset_split,
    Bm25Index, bm25_index, bm25_topk, bm25_topk_indexed,
    classifier_score, quality_gate, vocab_topn, vocab_coverage,
    distinctive_terms, bigram_logprob, span_corruption,
    decontaminated_split)
from vivace_graph_v3_spark.pipeline.dedup import (
    MinhashIndex, minhash_index, minhash_dedup_incremental)
from vivace_graph_v3_spark.pipeline.similarity import (
    label_centroid_outliers)
from vivace_graph_v3_spark.pipeline.multimodal import (
    synthesize_wav_media, decode_audio_features,
    synthesize_ppm_stream_media, video_frame_features)

__all__ = [
    "with_token_count", "with_quality_score", "with_lang_id",
    "with_fingerprint",
    "exact_dedup", "ngram_jaccard_pairs", "minhash_lsh_candidates",
    "minhash_dedup_pairs", "simhash_signatures", "simhash_dup_pairs",
    "embedding_dup_pairs",
    "cosine_topk_bruteforce", "ivf_ann_topk", "ivf_index", "ivf_probe",
    "lsh_ann_topk", "train_centroids",
    "synthesize_media", "synthesize_ppm_media", "decode_and_featurize",
    "resize_image", "frame_sample",
    "dense_topk", "hybrid_rrf", "pack_sequences", "packing_stats",
    "redact_pii", "collocations_pmi", "dataset_split",
    "Bm25Index", "bm25_index", "bm25_topk", "bm25_topk_indexed",
    "classifier_score", "quality_gate", "vocab_topn", "vocab_coverage",
    "distinctive_terms", "bigram_logprob", "span_corruption",
    "decontaminated_split", "MinhashIndex", "minhash_index",
    "minhash_dedup_incremental", "label_centroid_outliers",
    "synthesize_wav_media", "decode_audio_features",
    "synthesize_ppm_stream_media", "video_frame_features",
]
