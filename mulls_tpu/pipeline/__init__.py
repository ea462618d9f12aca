from mulls_tpu.pipeline.odometry import OdometryPipeline, OdometryResult

__all__ = ["OdometryPipeline", "OdometryResult"]
