"""spark-submit entry points (SURVEY §2.10): the reference-parity kNN CLI
(run_lsh_knn — ``./prog input_file k`` analog, options.cpp flag names)
and the dedup-pipeline CLI (run_pipeline)."""
