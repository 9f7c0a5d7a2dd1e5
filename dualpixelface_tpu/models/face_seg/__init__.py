from dualpixelface_tpu.models.face_seg.model import BiSeNet
from dualpixelface_tpu.models.face_seg.evaluate import FaceMaskEstimator
