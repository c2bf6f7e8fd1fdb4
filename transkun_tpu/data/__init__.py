from .note import ControlChange, Note, parse_event_all, resolve_overlapping, validate_notes
from .labels import encode_batch, prepare_intervals, prepare_intervals_no_quantize
