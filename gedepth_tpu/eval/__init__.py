from gedepth_tpu.eval.evaluator import Evaluator, build_test_pipeline
