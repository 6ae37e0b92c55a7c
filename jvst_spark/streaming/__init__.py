"""Structured Streaming validation.

The reference's "streaming" is incremental parse of ONE document
(JVST_MORE, src/validate.h:9). At table scale, streaming means
Structured Streaming micro-batches: the typed validation projection is
stateless, so the same compiled plan applies unchanged to readStream
sources; windowed violation-rate monitoring adds watermarked
aggregation on top.
"""
