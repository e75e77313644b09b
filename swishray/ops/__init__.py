"""Large-scale table operators beyond the reference's own inventory:
deduplication across every modality (exact / MinHash-LSH / SimHash /
n-gram Jaccard / embedding-cosine for text; perceptual dHash/aHash
for images; spectral fingerprints for audio; majority-dHash for
video — the non-text three share one generic banded-Hamming
blocking), text analysis (lang-id, quality, token counts,
fingerprints), similarity search (brute-force + IVF), and REAL
multimodal decode (from-scratch PNG/JPEG/TIFF/WebP/GIF/BMP/PPM/WAV/
Y4M/MJPEG-AVI codecs) — the operations a web-scale training-data
pipeline needs (task brief), each expressed Ray-Data-first."""
