from . import anchors, matcher, nms, roi_align, sampling

__all__ = ["anchors", "matcher", "nms", "roi_align", "sampling"]
