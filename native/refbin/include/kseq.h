// Minimal kseq-API-compatible FASTA/FASTQ reader over gzFile, written
// fresh for the reference golden build (the klib original is not vendored
// in the reference snapshot).  Provides exactly the surface main.cpp
// uses: KSEQ_INIT2(, gzFile, gzread), kseq_init/read/destroy, fields
// name.{l,s}, seq.{l,s}, and f->is_eof for the batching check
// (main.cpp:688).
//
// Grammar (klib-equivalent): records start at '>' (FASTA) or '@' (FASTQ);
// name is the first whitespace-delimited token; sequence lines accumulate
// until the next record header or a '+' separator; FASTQ quality consumes
// exactly seq.l non-newline bytes.
#pragma once

#include <cstdlib>
#include <cstring>

typedef struct {
    size_t l, m;
    char *s;
} kstring_t;

#define KSEQ_BUF_SIZE 16384

#define KSEQ_INIT2(SCOPE, type_t, __readfn)                                   \
                                                                              \
    typedef struct __kstream_t {                                              \
        unsigned char *buf;                                                   \
        int begin, end, is_eof;                                               \
        type_t f;                                                             \
    } kstream_t;                                                              \
                                                                              \
    typedef struct {                                                          \
        kstring_t name, comment, seq, qual;                                   \
        int last_char;                                                        \
        kstream_t *f;                                                         \
    } kseq_t;                                                                 \
                                                                              \
    static inline int ks_getc(kstream_t *ks) {                                \
        if (ks->begin >= ks->end) {                                           \
            if (ks->is_eof) return -1;                                        \
            ks->begin = 0;                                                    \
            ks->end = __readfn(ks->f, ks->buf, KSEQ_BUF_SIZE);                \
            if (ks->end < KSEQ_BUF_SIZE) ks->is_eof = 1;                      \
            if (ks->end <= 0) return -1;                                      \
        }                                                                     \
        return (int)ks->buf[ks->begin++];                                     \
    }                                                                         \
                                                                              \
    static inline void ks_putc(kstring_t *str, int c) {                       \
        if (str->l + 2 > str->m) {                                            \
            str->m = str->m ? str->m * 2 : 64;                                \
            str->s = (char *)realloc(str->s, str->m);                         \
        }                                                                     \
        str->s[str->l++] = (char)c;                                           \
        str->s[str->l] = 0;                                                   \
    }                                                                         \
                                                                              \
    static kseq_t *kseq_init(type_t f) {                                      \
        kseq_t *s = (kseq_t *)calloc(1, sizeof(kseq_t));                      \
        s->f = (kstream_t *)calloc(1, sizeof(kstream_t));                     \
        s->f->buf = (unsigned char *)malloc(KSEQ_BUF_SIZE);                   \
        s->f->f = f;                                                          \
        return s;                                                             \
    }                                                                         \
                                                                              \
    static void kseq_destroy(kseq_t *s) {                                     \
        if (!s) return;                                                       \
        free(s->name.s);                                                      \
        free(s->comment.s);                                                   \
        free(s->seq.s);                                                       \
        free(s->qual.s);                                                      \
        free(s->f->buf);                                                      \
        free(s->f);                                                           \
        free(s);                                                              \
    }                                                                         \
                                                                              \
    static int kseq_read(kseq_t *sq) {                                        \
        int c;                                                                \
        kstream_t *ks = sq->f;                                                \
        if (sq->last_char == 0) {                                             \
            while ((c = ks_getc(ks)) != -1 && c != '>' && c != '@') {         \
            }                                                                 \
            if (c == -1) return -1;                                           \
            sq->last_char = c;                                                \
        }                                                                     \
        sq->name.l = sq->comment.l = sq->seq.l = sq->qual.l = 0;              \
        while ((c = ks_getc(ks)) != -1 && c != ' ' && c != '\t' &&            \
               c != '\r' && c != '\n')                                        \
            ks_putc(&sq->name, c);                                            \
        if (c != '\n' && c != -1) {                                           \
            while ((c = ks_getc(ks)) != -1 && c != '\n')                      \
                if (c != '\r') ks_putc(&sq->comment, c);                      \
        }                                                                     \
        while ((c = ks_getc(ks)) != -1 && c != '>' && c != '+' && c != '@') { \
            if (c == '\n' || c == '\r') continue;                             \
            ks_putc(&sq->seq, c);                                             \
        }                                                                     \
        if (c == '>' || c == '@') sq->last_char = c;                          \
        if (c != '+') {                                                       \
            if (sq->seq.l == 0 && c == -1) return -1;                         \
            return (int)sq->seq.l;                                            \
        }                                                                     \
        while ((c = ks_getc(ks)) != -1 && c != '\n') {                        \
        }                                                                     \
        while (sq->qual.l < sq->seq.l && (c = ks_getc(ks)) != -1) {           \
            if (c == '\n' || c == '\r') continue;                             \
            ks_putc(&sq->qual, c);                                            \
        }                                                                     \
        sq->last_char = 0;                                                    \
        if (sq->qual.l != sq->seq.l) return -2;                               \
        return (int)sq->seq.l;                                                \
    }

#define KSEQ_INIT(type_t, __readfn) KSEQ_INIT2(, type_t, __readfn)
