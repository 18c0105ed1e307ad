from tpudet.serving.export import (
    ServingModel,
    export_model,
    load_artifact,
    save_artifact,
)

__all__ = ["ServingModel", "export_model", "load_artifact", "save_artifact"]
