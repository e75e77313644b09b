/* scalar_dump — A/B harness for the reference's scalar string/time
 * functions (string.c, utf8.c via string.c, times.c). Dev-only, built
 * by build_reference.sh alongside golden_dump.
 *
 * Usage:
 *   scalar_dump escape <str>       -> swish_str_escape_utf8
 *   scalar_dump unescape <str>     -> swish_str_unescape_utf8
 *   scalar_dump date <y> <m> <d>   -> swish_date_to_string
 *   scalar_dump int <str>          -> swish_string_to_int
 *   scalar_dump bool <str>         -> swish_string_to_boolean
 *   scalar_dump double <val>       -> swish_double_to_string
 *   scalar_dump time <epoch>       -> swish_time_format
 *   scalar_dump cp <str>           -> per-char codepoint/len/numchrs
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <libswish3.h>

int
main(int argc, char **argv)
{
    if (argc < 3)
        return 2;
    if (!strcmp(argv[1], "escape")) {
        xmlChar *r = swish_str_escape_utf8((xmlChar *)argv[2]);
        printf("%s\n", (char *)r);
    }
    else if (!strcmp(argv[1], "unescape")) {
        xmlChar *r = swish_str_unescape_utf8((xmlChar *)argv[2]);
        printf("%s\n", (char *)r);
    }
    else if (!strcmp(argv[1], "date")) {
        xmlChar *r = swish_date_to_string(atoi(argv[2]), atoi(argv[3]),
                                          atoi(argv[4]));
        printf("%s\n", (char *)r);
    }
    else if (!strcmp(argv[1], "int")) {
        printf("%d\n", swish_string_to_int(argv[2]));
    }
    else if (!strcmp(argv[1], "bool")) {
        printf("%d\n", swish_string_to_boolean(argv[2]));
    }
    else if (!strcmp(argv[1], "double")) {
        xmlChar *r = swish_double_to_string(atof(argv[2]));
        printf("%s\n", (char *)r);
    }
    else if (!strcmp(argv[1], "time")) {
        char *r = swish_time_format((time_t)atol(argv[2]));
        printf("%s\n", r);
    }
    else if (!strcmp(argv[1], "cp")) {
        xmlChar *u = (xmlChar *)argv[2];
        int i = 0, n = (int)strlen(argv[2]);
        printf("num=%d\n", swish_utf8_num_chrs(u));
        while (i < n) {
            printf("%d %d %d\n", i, swish_utf8_chr_len(u + i),
                   swish_utf8_codepoint(u + i));
            swish_utf8_next_chr(u, &i);
        }
    }
    else {
        return 2;
    }
    return 0;
}
