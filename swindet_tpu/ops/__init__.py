from .roi_align import map_roi_levels, multilevel_roi_align, roi_align_single

__all__ = ['map_roi_levels', 'multilevel_roi_align', 'roi_align_single']
