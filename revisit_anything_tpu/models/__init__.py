from revisit_anything_tpu.models import dinov2  # noqa: F401
