"""Spatial-map plotting (reference: modl/plotting/fmri.py).

``display_maps`` uses nilearn when available; the numpy fallback tiles
middle slices of the component volume stack with matplotlib.
"""
import numpy as np

__all__ = ["display_maps"]


def display_maps(fig, components_img, index=0):
    try:  # pragma: no cover - nilearn absent in CI
        from nilearn import plotting
        fig.subplots_adjust(top=0.8)
        plotting.plot_prob_atlas(components_img, view_type="filled_contours",
                                 figure=fig)
        return fig
    except Exception:
        pass
    vol = np.asarray(components_img)
    if vol.ndim != 4:
        raise ValueError('expected a 4-D (x, y, z, k) component stack')
    k = vol.shape[3]
    z = vol.shape[2] // 2
    side = int(np.ceil(np.sqrt(k)))
    for i in range(k):
        ax = fig.add_subplot(side, side, i + 1)
        ax.imshow(vol[:, :, z, i], interpolation='nearest')
        ax.set_xticks(())
        ax.set_yticks(())
    return fig
