/* Test-only AAC oracle: drives the system libavcodec so the framework's
 * own AAC-LC core (dabjax/audio/aac_lc.py) can be cross-checked against an
 * independent implementation at the 1024-sample frame length (libavcodec
 * rejects the DAB+ 960 transform, which is exactly why dabjax carries its
 * own decoder; see VERDICT round 1 item 1).
 *
 * Protocols (all little-endian u32 length prefixes):
 *   aac_oracle decode <asc-hex>   stdin: [len][raw AU]...        -> stdout:
 *       [len][interleaved float32 PCM]... one record per decoded frame
 *   aac_oracle encode <rate> <ch> <bitrate>  stdin: raw float32 PCM
 *       -> stdout: first record = extradata (ASC), then [len][AU]...
 *
 * Build: gcc aac_oracle.c -o aac_oracle -lavcodec -lavutil
 */

#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include <libavcodec/avcodec.h>
#include <libavutil/channel_layout.h>
#include <libavutil/opt.h>

static int read_rec(FILE *f, uint8_t **buf, uint32_t *len) {
    uint32_t n;
    if (fread(&n, 4, 1, f) != 1) return 0;
    *buf = realloc(*buf, n ? n : 1);
    if (n && fread(*buf, 1, n, f) != n) return 0;
    *len = n;
    return 1;
}

static void write_rec(FILE *f, const uint8_t *buf, uint32_t len) {
    fwrite(&len, 4, 1, f);
    fwrite(buf, 1, len, f);
}

static void emit_frame(AVCodecContext *ctx, AVFrame *frame) {
    int ch = ctx->ch_layout.nb_channels;
    int n = frame->nb_samples;
    float *inter = malloc(sizeof(float) * n * ch);
    if (frame->format == AV_SAMPLE_FMT_FLTP) {
        for (int c = 0; c < ch; c++) {
            const float *src = (const float *)frame->data[c];
            for (int i = 0; i < n; i++) inter[i * ch + c] = src[i];
        }
    } else if (frame->format == AV_SAMPLE_FMT_FLT) {
        memcpy(inter, frame->data[0], sizeof(float) * n * ch);
    } else {
        fprintf(stderr, "unexpected sample format %d\n", frame->format);
        exit(3);
    }
    write_rec(stdout, (uint8_t *)inter, sizeof(float) * n * ch);
    free(inter);
}

static int run_decode(const char *asc_hex) {
    const AVCodec *codec = avcodec_find_decoder(AV_CODEC_ID_AAC);
    AVCodecContext *ctx = avcodec_alloc_context3(codec);
    size_t asc_len = strlen(asc_hex) / 2;
    ctx->extradata = av_mallocz(asc_len + AV_INPUT_BUFFER_PADDING_SIZE);
    for (size_t i = 0; i < asc_len; i++) {
        unsigned v;
        sscanf(asc_hex + 2 * i, "%2x", &v);
        ctx->extradata[i] = (uint8_t)v;
    }
    ctx->extradata_size = asc_len;
    if (avcodec_open2(ctx, codec, NULL) < 0) {
        fprintf(stderr, "decoder open failed\n");
        return 2;
    }
    AVPacket *pkt = av_packet_alloc();
    AVFrame *frame = av_frame_alloc();
    uint8_t *buf = NULL;
    uint32_t len;
    while (read_rec(stdin, &buf, &len)) {
        uint8_t *padded = av_mallocz(len + AV_INPUT_BUFFER_PADDING_SIZE);
        memcpy(padded, buf, len);
        pkt->data = padded;
        pkt->size = len;
        if (avcodec_send_packet(ctx, pkt) < 0) {
            fprintf(stderr, "send_packet failed\n");
            return 4;
        }
        while (avcodec_receive_frame(ctx, frame) == 0)
            emit_frame(ctx, frame);
        av_free(padded);
    }
    avcodec_send_packet(ctx, NULL);
    while (avcodec_receive_frame(ctx, frame) == 0)
        emit_frame(ctx, frame);
    return 0;
}

static int run_encode(int rate, int channels, int bitrate,
                      int nopts, char **opts) {
    const AVCodec *codec = avcodec_find_encoder(AV_CODEC_ID_AAC);
    AVCodecContext *ctx = avcodec_alloc_context3(codec);
    ctx->sample_rate = rate;
    av_channel_layout_default(&ctx->ch_layout, channels);
    ctx->sample_fmt = AV_SAMPLE_FMT_FLTP;
    ctx->bit_rate = bitrate;
    ctx->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
    for (int i = 0; i + 1 < nopts; i += 2)
        if (av_opt_set(ctx->priv_data, opts[i], opts[i + 1], 0) < 0)
            fprintf(stderr, "option %s=%s rejected\n", opts[i], opts[i + 1]);
    if (avcodec_open2(ctx, codec, NULL) < 0) {
        fprintf(stderr, "encoder open failed\n");
        return 2;
    }
    write_rec(stdout, ctx->extradata, ctx->extradata_size);
    AVPacket *pkt = av_packet_alloc();
    AVFrame *frame = av_frame_alloc();
    frame->format = AV_SAMPLE_FMT_FLTP;
    frame->nb_samples = ctx->frame_size;
    av_channel_layout_copy(&frame->ch_layout, &ctx->ch_layout);
    av_frame_get_buffer(frame, 0);
    size_t chunk = sizeof(float) * ctx->frame_size * channels;
    float *inbuf = malloc(chunk);
    size_t got;
    int64_t pts = 0;
    for (;;) {
        got = fread(inbuf, 1, chunk, stdin);
        if (got < chunk) break;
        av_frame_make_writable(frame);
        for (int c = 0; c < channels; c++) {
            float *dst = (float *)frame->data[c];
            for (int i = 0; i < ctx->frame_size; i++)
                dst[i] = inbuf[i * channels + c];
        }
        frame->pts = pts;
        pts += ctx->frame_size;
        if (avcodec_send_frame(ctx, frame) < 0) return 4;
        while (avcodec_receive_packet(ctx, pkt) == 0) {
            write_rec(stdout, pkt->data, pkt->size);
            av_packet_unref(pkt);
        }
    }
    avcodec_send_frame(ctx, NULL);
    while (avcodec_receive_packet(ctx, pkt) == 0) {
        write_rec(stdout, pkt->data, pkt->size);
        av_packet_unref(pkt);
    }
    return 0;
}

int main(int argc, char **argv) {
    if (argc >= 3 && !strcmp(argv[1], "decode"))
        return run_decode(argv[2]);
    if (argc >= 5 && !strcmp(argv[1], "encode"))
        return run_encode(atoi(argv[2]), atoi(argv[3]), atoi(argv[4]),
                          argc - 5, argv + 5);
    fprintf(stderr, "usage: %s decode <asc-hex> | encode <rate> <ch> <bps>\n",
            argv[0]);
    return 1;
}
