/* Internal per-frame hooks into the MR122 codec (amrnb.cc), used by
 * the DTX layer in amrnb_low.cc to interleave 12.2 speech frames with
 * SID/NO_DATA comfort-noise frames while keeping the encoder's
 * mirrored decoder state converged. Not part of the public augment.h
 * API. */
#ifndef ASVSPOOF_AMRNB_INTERNAL_H_
#define ASVSPOOF_AMRNB_INTERNAL_H_

#include "amrnb_celp.h"

struct Amrnb122Enc;
struct Amrnb122Dec;

Amrnb122Enc* amrnb122_enc_new();
void amrnb122_enc_free(Amrnb122Enc* e);
/* encode one 160-sample frame into a 244-bit frame */
void amrnb122_enc_frame(Amrnb122Enc* e, const double* frame,
                        amrnb_celp::Bits* bits);
/* push one frame of externally generated comfort-noise excitation into
 * the mirrored adaptive-codebook history (DTX silence periods) */
void amrnb122_enc_push_cn(Amrnb122Enc* e, const double* exc160);

Amrnb122Dec* amrnb122_dec_new();
void amrnb122_dec_free(Amrnb122Dec* d);
void amrnb122_dec_frame(Amrnb122Dec* d, const amrnb_celp::Bits& bits,
                        double* out160);
void amrnb122_dec_push_cn(Amrnb122Dec* d, const double* exc160);
/* the decoder's postfilter chain state, for CN synthesis continuity */
amrnb_celp::ChainState* amrnb122_dec_chain(Amrnb122Dec* d);

#endif /* ASVSPOOF_AMRNB_INTERNAL_H_ */
