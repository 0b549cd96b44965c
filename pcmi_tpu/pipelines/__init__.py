"""User-facing pipeline components."""

from pcmi_tpu.pipelines.height_map import (
    HeightMapExtractor,
    HeightMapPipeline,
    PairProduct,
    pair_core,
    product_point_cloud,
    required_max_disp,
)
from pcmi_tpu.pipelines.multiday import (
    FusedCloud,
    MultiDayFusion,
    fused_consistency_dsm,
)
from pcmi_tpu.pipelines.streaming import StreamingAOIPipeline
from pcmi_tpu.pipelines.sweep import AOISpec, MultiAOISweep
from pcmi_tpu.pipelines.saliency import SaliencyDetector
from pcmi_tpu.pipelines.restoration import RestorationEngine, RestorationPlugin
from pcmi_tpu.pipelines.stitching import ImageStitcher, ImageStitchingPlugin
from pcmi_tpu.pipelines.landuse import OBIAClassifier, LandUseClassificationPlugin
from pcmi_tpu.pipelines.detection import ObjectDetector, ObjectAnnotationPlugin
from pcmi_tpu.pipelines.superres import InpaintingPlugin, SuperResolutionPlugin
from pcmi_tpu.pipelines.generative import (
    EnhancementProcessor,
    ImageRestorationProcessor,
    RestorationGenerativePlugin,
    StitchingProcessor,
    available_engines,
)

__all__ = [
    "StreamingAOIPipeline",
    "AOISpec",
    "MultiAOISweep",
    "SaliencyDetector",
    "RestorationEngine",
    "RestorationPlugin",
    "ImageStitcher",
    "ImageStitchingPlugin",
    "OBIAClassifier",
    "LandUseClassificationPlugin",
    "ObjectDetector",
    "ObjectAnnotationPlugin",
    "InpaintingPlugin",
    "SuperResolutionPlugin",
    "EnhancementProcessor",
    "ImageRestorationProcessor",
    "RestorationGenerativePlugin",
    "StitchingProcessor",
    "available_engines",
    "HeightMapExtractor",
    "HeightMapPipeline",
    "PairProduct",
    "pair_core",
    "product_point_cloud",
    "required_max_disp",
    "FusedCloud",
    "MultiDayFusion",
]
