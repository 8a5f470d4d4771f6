from logray.state.manifest import RunManifest, run_resumable

__all__ = ["RunManifest", "run_resumable"]
