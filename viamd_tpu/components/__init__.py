"""Built-in components — the plugin layer.

Rebuild of the reference's self-registering EventHandler components
(SURVEY.md §1 L5: src/components/{ramachandran,shapespace,dataset,
density_volume}): each subscribes to session events in its constructor and
exposes its analysis/rendering surface programmatically (the windows of the
GUI become methods returning arrays/figures-ready data).
"""


def builtin_components():
    from viamd_tpu.components.dataset import DatasetComponent
    from viamd_tpu.components.density_volume import DensityVolumeComponent
    from viamd_tpu.components.ramachandran import RamachandranComponent
    from viamd_tpu.components.shapespace import ShapespaceComponent
    from viamd_tpu.components.veloxchem import VeloxchemComponent

    return [
        DatasetComponent,
        RamachandranComponent,
        ShapespaceComponent,
        DensityVolumeComponent,
        VeloxchemComponent,
    ]
