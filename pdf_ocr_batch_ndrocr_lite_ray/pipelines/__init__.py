"""End-to-end plan builders over ``ray.data.Dataset``."""
