"""Dataset preprocessing: silence slicing, feature extraction, dataset build."""

from rvc_tpu.preprocess.slicer import Slicer
from rvc_tpu.preprocess.preprocessor import AudioPreprocessor
from rvc_tpu.preprocess.features import FeatureExtractor
from rvc_tpu.preprocess.dataset import DatasetBuilder

__all__ = ["Slicer", "AudioPreprocessor", "FeatureExtractor", "DatasetBuilder"]
